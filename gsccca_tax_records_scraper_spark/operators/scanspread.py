"""Adaptive scan spreading for compute-dense stages.

Expression- or Pandas-UDF-dense stages (shingling, media decode, embedding
math) run on the SCAN's partitioning. A large, properly-written table gives
the scan plenty of splits, but a small input — one parquet file with one
row group, exactly what local test/bench tables are — yields ONE partition
and serializes the whole stage on a single core, however many the session
has.

`spread_scan` repartitions ONLY when the scan is under-split relative to
the session's parallelism: at production scale it is a pass-through (no
shuffle added to a 100-TB plan), on an under-split input it pays one cheap
shuffle of the raw rows to unlock every core (measured:
ngram_overlap_pairs 6.7s -> 1.8s warm at sf0.1, where the 5000-doc
documents table is a single file)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
