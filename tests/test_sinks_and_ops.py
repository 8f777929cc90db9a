"""Sinks (S5-S9/J2), address merge (J4), scored top-k (A2/O3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark import sitegen
from gsccca_tax_records_scraper_spark.functions import extract
from gsccca_tax_records_scraper_spark.operators import addrmerge, scoring
from gsccca_tax_records_scraper_spark.sources import sinks


# ------------------------------------------------------------------ sinks

def test_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "records")
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (2, "b", "y2")], "k1 int, k2 string, payload string"
    )
    n1 = sinks.upsert_records(spark, df, path, ["k1", "k2"])
    assert n1 == 2  # batch-internal dedup on the natural key
    n2 = sinks.upsert_records(spark, df, path, ["k1", "k2"])
    assert n2 == 0  # idempotent re-run inserts nothing
    df2 = spark.createDataFrame([(3, "c", "z"), (1, "a", "dup")], "k1 int, k2 string, payload string")
    assert sinks.upsert_records(spark, df2, path, ["k1", "k2"]) == 1
    assert spark.read.parquet(path).count() == 3


def test_upsert_null_keys_idempotent(spark, tmp_path):
    path = str(tmp_path / "nullkeys")
    df = spark.createDataFrame(
        [(1, None, "x"), (None, None, "y")], "k1 int, k2 string, payload string"
    )
    assert sinks.upsert_records(spark, df, path, ["k1", "k2"]) == 2
    # NULL key components must still match themselves on re-run
    assert sinks.upsert_records(spark, df, path, ["k1", "k2"]) == 0
    assert spark.read.parquet(path).count() == 2


def test_export_single_file_pads_and_renames(spark, tmp_path):
    path = str(tmp_path / "export")
    df = spark.createDataFrame([(1, None)], "a int, b string")
    sinks.export_single_file(
        df, path, [("b", "B Header"), ("missing_col", "Ghost"), ("a", "A")]
    )
    out = spark.read.parquet(path)
    assert out.columns == ["B Header", "Ghost", "A"]
    row = out.first()
    assert row["B Header"] == "" and row["Ghost"] == ""
    import glob

    assert len(glob.glob(f"{path}/part-*")) == 1  # single file


def test_read_latest_export(spark, tmp_path):
    import time

    d = tmp_path / "exports"
    for i, name in enumerate(["one", "two"]):
        sinks.export_single_file(
            spark.createDataFrame([(i,)], "v int"), str(d / name), None
        )
        time.sleep(0.05)
    latest = sinks.read_latest_export(spark, str(d))
    assert latest.first().v == 1


# --------------------------------------------------------------- J4 merge

def test_merge_address_pair_token_union():
    # mirrors ocr/addr.py:11-43 semantics: the LONGER address is the base
    a = "123 MAIN ST ATLANTA GA 30303"
    b = "123 MAIN ST SUITE 4 ATLANTA GA 30303"
    assert addrmerge.merge_address_pair(a, b) == b  # b longer -> base
    assert addrmerge.merge_address_pair(b, a) == b  # order-insensitive base pick
    assert addrmerge.merge_address_pair(a, a) == a
    # shorter secondary still contributes its unseen tokens
    assert (
        addrmerge.merge_address_pair("123 MAIN ST ATLANTA GA 30303", "SUITE 4")
        == "123 MAIN ST ATLANTA GA 30303 SUITE 4"
    )
    # comma stripped anywhere in a token for comparison; periods NOT stripped
    assert (
        addrmerge.merge_address_pair("1 ELM ST ATLANTA GA", "ATLAN,TA N.E.")
        == "1 ELM ST ATLANTA GA N.E."
    )


def test_merge_address_lists_zip_first_match():
    primary = ["5 OAK AVE MACON GA 31201", "9 PINE RD NOWHERE GA 99999"]
    secondary = [
        "5 OAK AVE APT 2 MACON GA 31201",
        "OTHER 31201 THING EXTRA",
    ]
    merged = addrmerge.merge_address_lists(primary, secondary)
    # first zip match wins (ordered; longer side is base), unmatched passes
    assert merged[0] == "5 OAK AVE APT 2 MACON GA 31201"
    assert merged[1] == primary[1]


def test_merge_addresses_cogrouped(spark):
    primary = spark.createDataFrame(
        [("d1", 0, "5 OAK AVE MACON GA 31201"), ("d2", 0, "1 ELM ST X GA 30000")],
        "doc_id string, ord int, addr string",
    )
    secondary = spark.createDataFrame(
        [("d1", 0, "5 OAK AVE APT 2 MACON GA 31201")],
        "doc_id string, ord int, addr string",
    )
    out = {r.doc_id: r.merged for r in addrmerge.merge_addresses(primary, secondary).collect()}
    assert out["d1"] == "5 OAK AVE APT 2 MACON GA 31201"
    assert out["d2"] == "1 ELM ST X GA 30000"  # no secondary side at all


# --------------------------------------------------------- A2 scored top-k

def test_scored_top_amounts_matches_pure_scorer(spark):
    urls = [sitegen.doc_url(n) for n in range(40)]
    rows = [(u, sitegen.detail_ocr_text(u)) for u in urls]
    df = spark.createDataFrame(rows, "url string, ocr string")
    out = scoring.scored_top_amounts(df, "ocr", "url", k=3)
    got: dict[str, list] = {}
    for r in sorted(out.collect(), key=lambda r: (r.doc_id, r.rank)):
        got.setdefault(r.doc_id, []).append((r.raw, r.score))
    for u, ocr in rows:
        expected = [
            (raw, pytest.approx(score))
            for score, raw in extract.score_money_candidates(ocr)[:3]
        ]
        assert [(raw, s) for raw, s in got[u]] == [(e[0], e[1]) for e in expected], u


def test_scored_top_amounts_total_due_wins(spark):
    df = spark.createDataFrame(
        [("d", "INTEREST $50.00\nTOTAL DUE: $10.00\nRANDOM $900.00")],
        "doc_id string, txt string",
    )
    top = scoring.scored_top_amounts(df, "txt", "doc_id", k=1).first()
    assert top.raw == "$10.00"  # keyword weight beats raw magnitude


def test_upsert_records_bucketed_merge_shape(spark, tmp_path):
    """Partition-pruned upsert: inserts once, keeps existing on conflict,
    scans only the buckets the batch touches (plan shows a key_bucket
    partition filter)."""
    p = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b2"), (None, "n")], "k int, v string"
    )
    n1 = sinks.upsert_records_bucketed(spark, df1, p, ["k"], n_buckets=8)
    assert n1 == 3  # 2 deduped in-batch, NULL key counts once
    # conflicting + new keys: existing win, only new inserted
    df2 = spark.createDataFrame(
        [(1, "A-changed"), (3, "c"), (None, "n-again")], "k int, v string"
    )
    n2 = sinks.upsert_records_bucketed(spark, df2, p, ["k"], n_buckets=8)
    assert n2 == 1
    rows = {r.k: r.v for r in spark.read.parquet(p).collect()}
    assert rows == {1: "a", 2: "b", 3: "c", None: "n"}
    # idempotence
    assert sinks.upsert_records_bucketed(spark, df2, p, ["k"], n_buckets=8) == 0
    # pruning reaches the scan: the existing-side read filters key_bucket
    from tests.test_plan_shapes import explain

    existing = spark.read.parquet(p).filter(F.col("key_bucket").isin([0, 1]))
    assert "key_bucket" in explain(existing).split("PartitionFilters")[1][:200]
