"""Object-store checkpointing (r2 verdict #6): manifest/_SUCCESS/rename ops
route through the Hadoop FileSystem API for URI workdirs. file:// exercises
the full JVM code path end-to-end in the sandbox; hdfs://s3a:// resolve from
the same scheme lookup."""

from __future__ import annotations

import pytest

from gsccca_tax_records_scraper_spark import simulator
from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine
from gsccca_tax_records_scraper_spark.sources.checkpoint import CheckpointStore


def test_crawl_over_file_uri_matches_local(spark, tmp_path):
    wd = f"file://{tmp_path}/crawl_uri"
    eng = CrawlEngine(spark, wd, epoch_seconds=60.0)
    eng.run([1])
    sim = simulator.simulate_crawl([1], epoch_seconds=60.0)
    assert {r.url for r in eng.seen().collect()} == sim.seen_urls
    # resume over the URI store: a fresh engine reads the committed manifest
    eng2 = CrawlEngine(spark, wd, epoch_seconds=60.0)
    assert eng2.store.last_epoch() == eng.store.last_epoch()
    assert eng2.run() == 0  # already drained; no bootstrap, no new epochs


def test_uri_store_requires_spark(tmp_path):
    with pytest.raises(ValueError, match="needs a SparkSession"):
        CheckpointStore(f"file://{tmp_path}/x")


def test_manifest_atomicity_over_uri(spark, tmp_path):
    st = CheckpointStore(f"file://{tmp_path}/atomic", spark)
    st.commit(0)
    st.commit(1)
    assert st.committed_epochs() == [0, 1]
    # tmp file from the rename protocol must not linger
    assert not (tmp_path / "atomic" / "MANIFEST.json.tmp").exists()
    assert (tmp_path / "atomic" / "MANIFEST.json").exists()


def test_meta_visible_only_after_commit(tmp_path):
    st = CheckpointStore(tmp_path / "m")
    assert st.meta("n_buckets") is None
    st.set_meta("n_buckets", 128)
    assert st.meta("n_buckets") is None  # pending, not yet committed
    st.commit(0)
    assert st.meta("n_buckets") == 128
    # a fresh store on the same workdir sees the committed value
    assert CheckpointStore(tmp_path / "m").meta("n_buckets") == 128
