"""Driver-contract protection: a representative subset of
__spark_entry__.queries() checked against oracle_sql() on DuckDB at sf0.001
(the full set runs via tools/check_contract.py and the driver at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_contract import TABLES, canon_rows

SUBSET = [
    "status_filter_resume",
    "anti_join_unseen",
    "argmax_order",
    "line_reconstruction",
    "lag_gap",
    "setops_except_intersect",
    "predicate_filter_suite",
    "viewer_url_lookup",
    "ann_lsh_topk",
    "tpch_q1",
    "revenue_by_segment",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "cosine_topk_bruteforce",
    "media_features_decoded",
    "winnow_overlap_pairs",
    "quality_score",
]


@pytest.fixture(scope="module")
def duck(sf001):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf001}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf001, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, sf001)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(oracles[name])
    dcols = [c.lower() for c in res.columns]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canon_rows(scols, srows) == canon_rows(dcols, drows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"source", "n_docs", "avg_quality", "total_tokens", "docs_with_dups"} == set(
        df.columns
    )


def test_every_query_has_callable_and_oracle_coverage():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 45
    missing = set(oracles) - set(qs)
    assert not missing
    # the driver records only the first 50 entries — never exceed the window
    assert len(qs) <= 50
    # every entry carries a full value oracle (the crawl-plumbing entries
    # embed their deterministic candidate stream as a VALUES literal and
    # recompute filter/dedup/renumber in SQL)
    assert set(qs) == set(oracles)
