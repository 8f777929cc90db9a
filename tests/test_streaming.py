"""Streaming wrappers: epoch crawl via foreachBatch (T1) and windowed
metrics with watermark (T7)."""

from __future__ import annotations

from gsccca_tax_records_scraper_spark import simulator
from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine
from gsccca_tax_records_scraper_spark.streaming.epoch_stream import run_streaming_crawl
from gsccca_tax_records_scraper_spark.streaming.windows import (
    streaming_tumbling_metrics,
    tumbling_metrics,
)


def test_streaming_crawl_matches_batch(spark, tmp_path):
    seeds = [4]
    eng = CrawlEngine(spark, tmp_path / "stream", epoch_seconds=60.0)
    n = run_streaming_crawl(eng, seeds, tick_seconds=0.5)
    assert n >= 1
    sim = simulator.simulate_crawl(seeds, epoch_seconds=60.0)
    assert {r.url for r in eng.seen().collect()} == sim.seen_urls
    assert eng.store.last_epoch() == sim.epochs


def test_streaming_window_agg_matches_batch(spark, sf001, tmp_path):
    events = spark.read.parquet(f"{sf001}/events.parquet")
    batch = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in tumbling_metrics(events, "1 hour").collect()
    }
    # the file streaming source wants a directory; stage the table into one
    src = str(tmp_path / "events_dir")
    events.repartition(8).write.parquet(src)
    # complete mode for the inspection sink: every trigger rewrites the full
    # result, so the memory table equals the final aggregation
    q = streaming_tumbling_metrics(
        spark, src, events.schema, "1 hour", query_name="metrics_stream_test",
        output_mode="complete",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.window_start, r.event_type): (r.n, r.total)
            for r in spark.sql("SELECT * FROM metrics_stream_test").collect()
        }
    finally:
        q.stop()
    assert streamed == batch
