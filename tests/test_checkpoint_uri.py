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
    names = sorted(p.name for p in (tmp_path / "atomic").glob("MANIFEST*"))
    # versioned protocol: v2 live, v1 kept as torn-write fallback, no tmp
    assert names == ["MANIFEST-1.json", "MANIFEST-2.json"], names
    # a third commit prunes v1
    st.commit(2)
    names = sorted(p.name for p in (tmp_path / "atomic").glob("MANIFEST*"))
    assert names == ["MANIFEST-2.json", "MANIFEST-3.json"], names


def test_manifest_versioning_crash_windows(tmp_path):
    """No crash window leaves the store without a readable manifest:
    a corrupt (torn) higher version falls back to its predecessor, and a
    pre-versioning workdir with a legacy MANIFEST.json still resumes."""
    import json

    st = CheckpointStore(tmp_path / "v")
    st.set_meta("n_buckets", 128)
    st.commit(0)
    st.commit(1)
    assert st.committed_epochs() == [0, 1]
    # torn write of the NEXT version (crash mid-create on a non-atomic
    # store): readers must fall back to the intact predecessor
    (tmp_path / "v" / "MANIFEST-3.json").write_text('{"epochs": [0, 1')
    st2 = CheckpointStore(tmp_path / "v")
    assert st2.committed_epochs() == [0, 1]
    assert st2.meta("n_buckets") == 128
    # ... and the next commit supersedes the torn file with v4
    st2.commit(2)
    assert CheckpointStore(tmp_path / "v").committed_epochs() == [0, 1, 2]

    # legacy layout: only MANIFEST.json present
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    (legacy / "MANIFEST.json").write_text(
        json.dumps({"epochs": [0, 1, 2], "compacted": {}, "meta": {"n_buckets": 256}})
    )
    st3 = CheckpointStore(legacy)
    assert st3.committed_epochs() == [0, 1, 2]
    assert st3.meta("n_buckets") == 256
    # first commit migrates to the versioned protocol and removes the relic
    st3.commit(3)
    assert not (legacy / "MANIFEST.json").exists()
    assert CheckpointStore(legacy).committed_epochs() == [0, 1, 2, 3]


def test_meta_visible_only_after_commit(tmp_path):
    st = CheckpointStore(tmp_path / "m")
    assert st.meta("n_buckets") is None
    st.set_meta("n_buckets", 128)
    assert st.meta("n_buckets") is None  # pending, not yet committed
    st.commit(0)
    assert st.meta("n_buckets") == 128
    # a fresh store on the same workdir sees the committed value
    assert CheckpointStore(tmp_path / "m").meta("n_buckets") == 128
