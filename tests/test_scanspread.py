"""spread_scan (operators/scanspread): under-split inputs are spread to the
session's parallelism, well-split inputs pass through untouched, and the
partition-count planning pass is memoized per analyzed-plan semantic hash
(the r4 verdict's measured regression source: an extra .rdd compile per
operator call)."""

from __future__ import annotations

from gsccca_tax_records_scraper_spark.operators import scanspread
from gsccca_tax_records_scraper_spark.operators.scanspread import spread_scan


def test_underspit_scan_is_spread(spark, tmp_path):
    p = str(tmp_path / "one.parquet")
    spark.range(0, 1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() == 1
    out = spread_scan(df)
    if target > 1:
        assert out.rdd.getNumPartitions() == target
    # content unchanged
    assert out.count() == 1000


def test_wellsplit_input_passes_through(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, numPartitions=target)
    out = spread_scan(df)
    # pass-through: same plan object semantics, no added exchange
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString() or out is df
    assert out is df


def test_partition_count_memoized(spark, tmp_path):
    p = str(tmp_path / "memo.parquet")
    spark.range(0, 10).coalesce(1).write.parquet(p)
    scanspread._NPARTS_CACHE.clear()
    spread_scan(spark.read.parquet(p))
    assert len(scanspread._NPARTS_CACHE) == 1
    ((key, n),) = scanspread._NPARTS_CACHE.items()
    assert n == 1
    # a semantically identical fresh plan hits the cache, not .rdd
    spread_scan(spark.read.parquet(p))
    assert len(scanspread._NPARTS_CACHE) == 1
    # a different plan gets its own entry
    spread_scan(spark.read.parquet(p).filter("id > 2"))
    assert len(scanspread._NPARTS_CACHE) == 2
