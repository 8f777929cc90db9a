"""Resume bit-identity (north_rule; SURVEY §5.6, T5).

Kill after epoch k (drop the engine object mid-run), construct a fresh
engine over the same checkpoint workdir, drain to completion: every output
table must equal the uninterrupted run's, row for row."""

from __future__ import annotations

from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine

SEEDS = [7]


def _table_key(eng, name):
    df = getattr(eng, name)()
    assert df is not None
    return sorted(map(str, df.collect()))


def test_resume_bit_identity(spark, tmp_path):
    a = CrawlEngine(spark, tmp_path / "a", epoch_seconds=60.0)
    a.run(SEEDS)

    b = CrawlEngine(spark, tmp_path / "b", epoch_seconds=60.0)
    b.bootstrap(SEEDS)
    b.step()
    b.step()
    del b  # "kill"
    b2 = CrawlEngine(spark, tmp_path / "b", epoch_seconds=60.0)
    b2.run()  # resume from last committed epoch

    assert a.store.committed_epochs() == b2.store.committed_epochs()
    for table in ("records", "documents", "seen", "metrics"):
        assert _table_key(a, table) == _table_key(b2, table), table


def test_partial_write_ignored(spark, tmp_path):
    """An uncommitted epoch dir (crash mid-write) must not poison resume."""
    eng = CrawlEngine(spark, tmp_path / "c", epoch_seconds=60.0)
    eng.bootstrap(SEEDS)
    eng.step()
    last = eng.store.last_epoch()
    # simulate a crash mid-epoch: garbage table dir for epoch last+1, no commit
    junk = eng.store.workdir / "frontier" / f"epoch={last + 1}"
    junk.mkdir(parents=True)
    (junk / "part-00000.parquet").write_bytes(b"not a parquet file")
    eng2 = CrawlEngine(spark, tmp_path / "c", epoch_seconds=60.0)
    assert eng2.store.last_epoch() == last
    assert eng2.step() is not None  # overwrites the junk and carries on
