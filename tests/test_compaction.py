"""Delta compaction: folded seen_exact reads must be content-identical and
resume must stay bit-identical across a compaction boundary."""

from __future__ import annotations

import json

from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine
from gsccca_tax_records_scraper_spark.simulator import simulate_crawl

SEEDS = [4]


def test_compaction_preserves_content_and_resume(spark, tmp_path):
    comp = CrawlEngine(spark, tmp_path / "comp", epoch_seconds=60.0, compact_every=2)
    comp.bootstrap(SEEDS)
    comp.step()
    comp.step()  # epoch 2 -> compaction committed
    manifest = json.loads((comp.store.workdir / "MANIFEST.json").read_text())
    assert manifest["compacted"] == {"seen_exact": 2}
    assert (comp.store.workdir / "seen_exact" / "compacted=2" / "_SUCCESS").exists()
    del comp
    comp2 = CrawlEngine(spark, tmp_path / "comp", epoch_seconds=60.0, compact_every=2)
    comp2.run()  # resume across the compaction boundary

    # compacted reads must equal the simulator ground truth exactly
    sim = simulate_crawl(SEEDS, epoch_seconds=60.0)
    assert {r.url for r in comp2.seen().collect()} == sim.seen_urls
    assert comp2.records().count() == len(sim.records)
    assert comp2.documents().count() == len(sim.spans)


def test_orphan_compaction_dir_ignored(spark, tmp_path):
    """A compaction dir written but never committed must not be read."""
    eng = CrawlEngine(spark, tmp_path / "o", epoch_seconds=60.0, compact_every=0)
    eng.bootstrap(SEEDS)
    eng.step()
    # fake a crash: compacted dir exists with GARBAGE, manifest never updated
    orphan = eng.store.workdir / "seen_exact" / "compacted=1"
    orphan.mkdir(parents=True)
    (orphan / "part-00000.parquet").write_bytes(b"junk")
    n_before = eng.seen().count()
    assert eng.store.compacted_epoch("seen_exact") is None
    assert eng.seen().count() == n_before  # reads deltas, ignores orphan
    assert eng.step() is not None  # crawl continues fine
