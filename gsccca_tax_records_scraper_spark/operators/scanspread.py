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
    # .rdd compiles the plan once more than necessary — a driver-side
    # planning pass only (no job), paid once per OPERATOR call, not per row;
    # PySpark exposes no cheaper partition count for an unexecuted plan.
    # Spread only when SEVERELY under-split (< half the session's cores):
    # a mid-plan input at e.g. 200 of 256 partitions keeps its partitioning
    # rather than paying a full shuffle of raw rows for a 28% wave gain.
    target = df.sparkSession.sparkContext.defaultParallelism
    nparts = df.rdd.getNumPartitions()
    # target > nparts: on a 1-2 core session a 1-partition scan is already
    # as spread as the session can use — repartitioning to <= the same
    # count would add a full shuffle for zero parallelism gain
    if nparts < max(2, target // 2) and target > nparts:
        return df.repartition(target)
    return df
