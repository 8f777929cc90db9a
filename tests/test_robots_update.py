"""Mid-crawl robots refresh (CrawlEngine.update_robots, r4 verdict missing
#5): a rules update takes effect at the next epoch boundary — tightened
disallow prefixes stop NEW admissions (already-admitted rows stay, per the
documented revoke-composes contract), shrunk budgets cap the next grant,
and the constructor's livelock guard applies to updates too."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark import sitegen
from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine
from gsccca_tax_records_scraper_spark.simulator import RobotsRule, default_robots

EPOCH_SECONDS = 60.0


def test_update_validates_livelock(spark, tmp_path):
    eng = CrawlEngine(spark, tmp_path / "wd0", epoch_seconds=EPOCH_SECONDS)
    with pytest.raises(ValueError, match="floors to 0 forever"):
        eng.update_robots({sitegen.HOT_HOST: RobotsRule((), 0.001, 0)})


def test_tightened_disallow_blocks_new_admissions_only(spark, tmp_path):
    eng = CrawlEngine(spark, tmp_path / "wd1", epoch_seconds=EPOCH_SECONDS)
    eng.bootstrap([1, 2])
    m = eng.step()
    assert m is not None and m["new_urls"] > 0
    before_epoch = eng.store.last_epoch()
    before = eng.store.read_snapshot(spark, "frontier", before_epoch)
    # pre-update: detail urls ARE admitted
    assert before.filter(F.col("url").contains("/Lien/liendetails")).count() > 0

    tightened = {
        h: RobotsRule(
            r.disallow_prefixes + ("/Lien/liendetails",), r.rate_per_sec, r.burst
        )
        for h, r in default_robots().items()
    }
    eng.update_robots(tightened)
    m2 = eng.step()
    assert m2 is not None
    epoch = eng.store.last_epoch()
    after = eng.store.read_snapshot(spark, "frontier", epoch)
    fresh = after.join(before.select("url_id"), "url_id", "left_anti")
    # no NEWLY admitted row matches the tightened prefix...
    assert fresh.filter(F.col("url").contains("/Lien/liendetails")).count() == 0
    # ...while rows admitted under the old rules were not retroactively
    # dropped (revoke is the removal mechanism, by contract)
    carried = after.join(before.select("url_id"), "url_id", "left_semi")
    assert (
        carried.filter(F.col("url").contains("/Lien/liendetails")).count()
        == before.filter(F.col("url").contains("/Lien/liendetails"))
        .join(after.select("url_id"), "url_id", "left_semi")
        .count()
    )


def test_shrunk_budget_caps_next_grant(spark, tmp_path):
    eng = CrawlEngine(spark, tmp_path / "wd2", epoch_seconds=EPOCH_SECONDS)
    eng.bootstrap([1, 2])
    m = eng.step()
    assert m is not None and m["granted"] > 2
    # throttle hard: budget ceiling r*T + burst = 0.01*60 + 1 = 1.6 -> at
    # most 1 grant per host at the next epoch
    slow = {
        h: RobotsRule(r.disallow_prefixes, 0.01, 1)
        for h, r in default_robots().items()
    }
    eng.update_robots(slow)
    m2 = eng.step()
    assert m2 is not None
    assert m2["granted"] <= len(slow)  # <= 1 per host
