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


# ----------------------- applyInPandasWithState streaming seen-set (T2/T3)

def test_streaming_dedup_stateful(spark, tmp_path):
    """URLs delivered across several micro-batches, with duplicates both
    within and across batches: the admitted stream carries each url exactly
    once, first delivery wins, state persists across triggers."""
    import json

    from gsccca_tax_records_scraper_spark.functions import urltools
    from gsccca_tax_records_scraper_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, urls):
        rows = [
            {
                "host_bucket": urltools.host_bucket_of(urltools.url_id(u)),
                "url_id": urltools.url_id(u),
                "url": u,
            }
            for u in urls
        ]
        p = src / f"{name}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))

    u = [f"https://search.gsccca.org/Lien/liendetails.asp?id={i}" for i in range(40)]
    write_batch("b0", u[:20] + u[:5])          # in-batch dups
    write_batch("b1", u[10:30])                # cross-batch dups 10..19
    write_batch("b2", u[25:40] + u[0:2])       # more cross-batch dups

    stream = (
        spark.readStream.schema("host_bucket int, url_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("admitted_urls")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r.url for r in spark.sql("SELECT url FROM admitted_urls").collect()]
    assert sorted(got) == sorted(u)       # every url exactly once
    assert len(got) == len(set(got)) == 40


def test_streaming_dedup_state_cap(spark, tmp_path):
    """Driving a bucket past max_ids_per_bucket must fail LOUDLY with the
    fan-out remediation — never commit a state row over the cap (r2 verdict
    #8: bounded streaming state)."""
    import json

    import pytest

    from gsccca_tax_records_scraper_spark.functions import urltools
    from gsccca_tax_records_scraper_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "src"
    src.mkdir()
    urls = [f"https://search.gsccca.org/Lien/liendetails.asp?id={i}" for i in range(200)]
    rows = [
        {"host_bucket": 0, "url_id": urltools.url_id(u), "url": u} for u in urls
    ]  # everything in ONE bucket: worst-case state row
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("host_bucket int, url_id long, url string")
        .json(str(src))
    )
    q = (
        streaming_dedup(stream, max_ids_per_bucket=50)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("capped_urls")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    with pytest.raises(Exception, match="max_ids_per_bucket"):
        try:
            q.processAllAvailable()
            raise AssertionError("stream should have failed over the cap")
        finally:
            q.stop()


def test_streaming_dedup_fanout_migration(spark, tmp_path):
    """r3 ADVICE #2: a fan-out change needs a FRESH checkpoint + state
    rebuild (state is keyed by the old bucket ids). reseed_frame replays the
    already-admitted urls at the new fan-out; after the replay drains, live
    dups are still dropped and only genuinely-new urls admit — exactly-once
    survives the re-sharding."""
    import json

    from gsccca_tax_records_scraper_spark.functions import urltools
    from gsccca_tax_records_scraper_spark.streaming.stateful import (
        reseed_frame,
        streaming_dedup,
    )

    urls = [f"https://search.gsccca.org/Lien/liendetails.asp?id={i}" for i in range(30)]
    n_old, n_new = 8, 16

    def rows(us, nb):
        return [
            {
                "host_bucket": urltools.host_bucket_of(urltools.url_id(u), nb),
                "url_id": urltools.url_id(u),
                "url": u,
            }
            for u in us
        ]

    # phase 1: original stream at fan-out 8 admits urls[:20]
    src1 = tmp_path / "src1"
    src1.mkdir()
    (src1 / "b0.json").write_text("\n".join(json.dumps(r) for r in rows(urls[:20], n_old)))
    stream1 = (
        spark.readStream.schema("host_bucket int, url_id long, url string")
        .json(str(src1))
    )
    q1 = (
        streaming_dedup(stream1)
        .writeStream.outputMode("append").format("memory")
        .queryName("mig_phase1")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    admitted1 = spark.sql("SELECT host_bucket, url_id, url FROM mig_phase1")
    assert admitted1.count() == 20

    # phase 2: FRESH checkpoint + source at fan-out 16. The replay frame
    # (admitted output relabeled to the new fan-out) drains FIRST, then the
    # live batch arrives with 15 dups + 10 new urls.
    src2 = tmp_path / "src2"
    src2.mkdir()
    replay = [r.asDict() for r in reseed_frame(admitted1, n_new).collect()]
    (src2 / "a_replay.json").write_text("\n".join(json.dumps(r) for r in replay))
    (src2 / "b_live.json").write_text(
        "\n".join(json.dumps(r) for r in rows(urls[5:30], n_new))
    )
    stream2 = (
        spark.readStream.schema("host_bucket int, url_id long, url string")
        .option("maxFilesPerTrigger", 1)  # replay file (lexically first) drains first
        .json(str(src2))
    )
    q2 = (
        streaming_dedup(stream2)
        .writeStream.outputMode("append").format("memory")
        .queryName("mig_phase2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = [r.url for r in spark.sql("SELECT url FROM mig_phase2").collect()]
    # replay re-admits the 20 (they are new to THIS stream) + exactly the
    # 10 genuinely-new live urls; the 15 live dups are dropped
    assert len(got) == len(set(got)) == 30
    assert sorted(got) == sorted(urls)
    # every replayed/admitted url landed in its NEW bucket
    bad = spark.sql(
        f"SELECT * FROM mig_phase2 WHERE host_bucket != pmod(url_id, {n_new})"
    ).count()
    assert bad == 0


def test_streaming_dedup_store_backend(spark, tmp_path):
    """Segment-store streaming variant: same exactly-once admissions as the
    inline state, but the state rows hold segment METADATA only — payloads
    live in the store, so the per-commit state write is O(MAX_SEGS) however
    large the seen set (the inline cap is structurally moot here)."""
    import json
    import os

    from gsccca_tax_records_scraper_spark.functions import urltools
    from gsccca_tax_records_scraper_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "segs")

    def write_batch(name, urls):
        rows = [
            {
                "host_bucket": urltools.host_bucket_of(urltools.url_id(u)),
                "url_id": urltools.url_id(u),
                "url": u,
            }
            for u in urls
        ]
        (src / f"{name}.json").write_text("\n".join(json.dumps(r) for r in rows))

    u = [f"https://search.gsccca.org/Lien/liendetails.asp?id={i}" for i in range(60)]
    write_batch("b0", u[:25] + u[:5])          # in-batch dups
    write_batch("b1", u[10:40])                # cross-batch dups
    write_batch("b2", u[35:60] + u[0:3])       # more cross-batch dups

    stream = (
        spark.readStream.schema("host_bucket int, url_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_dedup(stream, store_root=root)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("admitted_store")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r.url for r in spark.sql("SELECT url FROM admitted_store").collect()]
    assert sorted(got) == sorted(u)
    assert len(got) == len(set(got)) == 60
    # segment files exist; multi-micro-batch buckets stacked/absorbed runs
    assert any(f.endswith(".seg") for f in os.listdir(root))
