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

# Partition count memoized per (application, analyzed-plan semanticHash):
# the .rdd planning pass costs ~70-150 ms of driver time per FRESH DataFrame
# (PySpark builds the Python-conversion RDD), and operator call sites rebuild
# the same logical plan every invocation — bench reps, retries, repeated
# queries. semanticHash is computed during analysis the DataFrame already
# paid for, so a hit skips the extra compile entirely. Staleness is benign:
# the worst case is a spread decision made from a superseded file listing,
# which affects parallelism of a tiny input, never correctness.
_NPARTS_CACHE: dict[tuple[str, int], int] = {}
_NPARTS_CACHE_MAX = 4096


def _scan_partitions(df: DataFrame) -> int:
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:  # py4j surface changed: fall back to the direct pass
        return df.rdd.getNumPartitions()
    n = _NPARTS_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if len(_NPARTS_CACHE) >= _NPARTS_CACHE_MAX:
            _NPARTS_CACHE.clear()
        _NPARTS_CACHE[key] = n
    return n


def spread_scan(df: DataFrame) -> DataFrame:
    # Spread only when SEVERELY under-split (< half the session's cores):
    # a mid-plan input at e.g. 200 of 256 partitions keeps its partitioning
    # rather than paying a full shuffle of raw rows for a 28% wave gain.
    target = df.sparkSession.sparkContext.defaultParallelism
    nparts = _scan_partitions(df)
    # target > nparts: on a 1-2 core session a 1-partition scan is already
    # as spread as the session can use — repartitioning to <= the same
    # count would add a full shuffle for zero parallelism gain
    if nparts < max(2, target // 2) and target > nparts:
        return df.repartition(target)
    return df
