"""Chaos resume: kills interleaved with MID-DRAIN maintenance (T4/T5).

test_resume.py proves plain kill-and-resume bit-identity; this suite proves
the stronger claim the checkpoint design makes (every mutation — drain
epoch, revocation, segment fold, reseed — commits as a normal epoch at a
manifest boundary): a kill after ANY of those commits, in the middle of an
active drain, resumes into a crawl whose final tables are row-identical to
the uninterrupted run of the same logical schedule. Reference analog: the
reference can only restart its resume-file loop between pages
(lien_index_scraper.py:114-128); the engine must survive restarts around
every state-mutating operation it adds on top.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine

SEEDS = [7]
TABLES = ("records", "documents", "seen", "metrics")


def _victims(eng):
    """Deterministic revocation set: first 4 SERP-admitted urls. Computed
    from epoch-0 seen state, identical in every schedule variant."""
    serp = {r.url for r in eng.seen().filter(F.col("epoch") == 0).collect()}
    return sorted(serp)[:4]


def _run_schedule(spark, wd, kill_after=None):
    """Execute the canonical schedule — bootstrap, 1 drain step, revoke 4
    urls MID-DRAIN, fold the segment stacks, another drain step, reseed
    (re-admits the revoked urls), drain to completion. `kill_after=i`
    drops the engine object right after op i and resumes on a fresh
    CrawlEngine over the same workdir. Returns (ops, final tables)."""
    eng = CrawlEngine(spark, wd, epoch_seconds=60.0)
    ops = []
    idx = 0

    def boundary():
        nonlocal eng, idx
        idx += 1
        if kill_after is not None and idx - 1 == kill_after:
            eng = CrawlEngine(spark, wd, epoch_seconds=60.0)

    eng.bootstrap(SEEDS)
    ops.append("bootstrap")
    boundary()  # kill point 0: after the bootstrap commit
    assert eng.step() is not None
    ops.append("step")
    boundary()
    eng.revoke(_victims(eng))
    ops.append("revoke")
    boundary()  # kill point 2: after a mid-drain revocation commit
    eng.fold_segments()
    ops.append("fold")
    boundary()
    assert eng.step() is not None
    ops.append("step")
    boundary()
    eng.reseed(SEEDS)
    ops.append("reseed")
    boundary()  # kill point 5: after the reseed commit
    while eng.step() is not None:
        ops.append("step")
        boundary()
    tables = {
        t: sorted(map(str, getattr(eng, t)().collect())) for t in TABLES
    }
    return ops, tables


@pytest.fixture(scope="module")
def reference(spark, tmp_path_factory):
    return _run_schedule(spark, tmp_path_factory.mktemp("chaos_ref"))


# 0 = after bootstrap, 2 = after the mid-drain revocation commit,
# 5 = after the reseed commit — each exercises a different epoch-commit
# path (bootstrap write, maintenance delta, frontier re-admission)
@pytest.mark.parametrize("kill_after", [0, 2, 5])
def test_kill_resume_bit_identity(spark, tmp_path, reference, kill_after):
    ref_ops, ref_tables = reference
    ops, tables = _run_schedule(spark, tmp_path, kill_after=kill_after)
    assert ops == ref_ops
    for t in TABLES:
        assert tables[t] == ref_tables[t], t


def test_reference_schedule_shape(reference):
    """The schedule really did interleave maintenance into an active
    drain: revoke/fold happen between drain steps, and the crawl still
    drains to a non-trivial corpus afterwards."""
    ref_ops, ref_tables = reference
    assert ref_ops[:6] == ["bootstrap", "step", "revoke", "fold", "step", "reseed"]
    assert ref_ops.count("step") >= 3
    assert len(ref_tables["records"]) >= 20
    # seen_exact is a delta HISTORY (rebuild = seen minus revoked,
    # last-wins by epoch): exactly the 4 revoked-then-reseeded urls
    # appear twice (epoch-0 admission + reseed re-admission), every
    # other url exactly once
    seen_urls = [s.split("url='")[1].split("'")[0] for s in ref_tables["seen"]]
    from collections import Counter

    counts = Counter(seen_urls)
    assert sorted(counts.values(), reverse=True)[:5] == [2, 2, 2, 2, 1]
