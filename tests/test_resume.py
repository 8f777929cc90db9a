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


def test_zero_grant_epoch_carries_tokens(spark, tmp_path):
    """epoch_seconds so small that budget floors to 0: the engine must keep
    committing token-accrual epochs (like the simulator), not abandon the
    frontier. rate 0.25/s x 2s = 0.5 tokens -> grant on every 2nd epoch."""
    from gsccca_tax_records_scraper_spark.simulator import simulate_crawl

    eng = CrawlEngine(spark, tmp_path / "z", epoch_seconds=2.0)
    eng.bootstrap([7])
    m1 = eng.step()
    assert m1 is not None and m1["granted"] == 0  # 0.5 tokens accrued
    m2 = eng.step()
    assert m2 is not None and m2["granted"] == 1  # 1.0 tokens -> one grant
    # first 12 epochs reproduce the simulator's zero-grant-epoch cadence
    eng.run(max_epochs=10)
    sim = simulate_crawl([7], epoch_seconds=2.0, max_epochs=12)
    got = {}
    for r in eng.records().collect():
        got.setdefault(r.epoch, []).append(r.url)
    for e in range(1, 13):
        assert sorted(got.get(e, [])) == sorted(sim.grant_order[e - 1]), e


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


def test_crashed_op_leaves_no_phantom_deltas(spark, tmp_path):
    """Ops write different table subsets at the same epoch number, so a
    crashed attempt's stray dirs must be purged when a DIFFERENT op later
    takes that epoch — otherwise read_deltas (which trusts any existing dir
    at a committed epoch) would surface the aborted attempt's rows.

    Crash A: a step wrote records/epoch=K+1 then died before commit; the
    operator retries with a revocation at K+1. Crash B: a revocation wrote
    revoked/epoch=E then died; a plain step commits E."""
    from pyspark.sql import functions as F

    wd = tmp_path / "ph"
    eng = CrawlEngine(spark, wd, epoch_seconds=60.0)
    eng.run(SEEDS)
    k = eng.store.last_epoch()

    # Crash A: phantom records dir at K+1 (parquet write leaves _SUCCESS)
    phantom = spark.createDataFrame(
        [("https://phantom.example/x", k + 1)], "url string, epoch int"
    )
    real_cols = eng.records().columns
    pad = phantom
    for c in real_cols:
        if c not in pad.columns:
            pad = pad.withColumn(c, F.lit(None))
    eng.store.write("records", k + 1, pad.select(*real_cols))
    victims = sorted(r.url for r in eng.seen().filter(F.col("epoch") == 0).collect())[:2]
    res = eng.revoke(victims)
    assert res["epoch"] == k + 1
    assert eng.records().filter(F.col("url").contains("phantom")).count() == 0

    # Crash B: phantom revoked dir at the next epoch, then a real step
    e = eng.store.last_epoch() + 1
    eng.store.write(
        "revoked", e,
        spark.createDataFrame(
            [(0, 1, "https://phantom.example/y", e)],
            "host_bucket int, url_id long, url string, epoch int",
        ),
    )
    eng.reseed(SEEDS)  # takes epoch e; must purge the stray revoked dir
    assert eng.store.last_epoch() == e
    rv = eng.revoked()
    assert rv.filter(F.col("url").contains("phantom")).count() == 0
    # the real revocation lineage from crash A survives
    assert {r.url for r in rv.collect()} == set(victims)
