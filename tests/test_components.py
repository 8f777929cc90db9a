"""Connected components / duplicate-cluster resolution
(operators/components.py) + the brute-force parity check for simhash
near-pairs (whose contract slot dup_clusters displaced).

Oracle here is a pure-Python union-find — independent of both the Spark
implementation and the DuckDB recursive-CTE contract oracle.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.operators import textdedup
from gsccca_tax_records_scraper_spark.operators.components import (
    connected_components,
    dup_clusters,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """min-id-per-component via union-find over every node in `edges`."""
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    groups: dict[int, list[int]] = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in groups.values() for n in ns}


def _cc_dict(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r["node"]: r["component"] for r in connected_components(df).collect()}


GRAPHS = {
    # seeded random graphs across densities (below/at/above the giant-
    # component threshold)
    **{
        f"rand_{n}_{m}": [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        for n, m in [(12, 6), (50, 30), (50, 80), (120, 300)]
        for rng in [random.Random(n * 1000 + m)]
    },
    # long chain: the adversarial case for round count — naive min-label
    # flooding needs O(n) rounds, star contraction must finish in O(log n)
    "chain": [(i, i + 1) for i in range(300)],
    # descending ids (exercises the orientation logic)
    "revchain": [(300 - i, 299 - i) for i in range(300)],
    # star + clique + isolated pair + self loop + duplicate/reversed edges
    "mixed": (
        [(0, i) for i in range(1, 20)]
        + [(a, b) for a in range(30, 36) for b in range(a + 1, 36)]
        + [(100, 101), (7, 7), (2, 0), (0, 2)]
    ),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_components_match_union_find(spark, name):
    edges = GRAPHS[name]
    assert _cc_dict(spark, edges) == _uf_components(edges)


def test_components_empty(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_components_string_ids(spark):
    """labels are type-generic: min works on any orderable id type."""
    df = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "doc_a string, doc_b string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dup_clusters_canonical_and_sizes(spark):
    df = spark.createDataFrame(
        [(5, 3), (3, 1), (9, 8), (8, 9)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dup_clusters(df).collect()
    }
    assert rows == {1: (1, 3), 3: (1, 3), 5: (1, 3), 8: (8, 2), 9: (8, 2)}
    # exactly one canonical doc (doc_id == cluster_id) per cluster
    canon = [d for d, (c, _) in rows.items() if d == c]
    assert sorted(canon) == [1, 8]


def test_dup_clusters_on_documents(spark, sf01):
    """end-to-end over the real pair generator: every cluster id is the
    cluster's min doc id, sizes are consistent, and membership matches the
    union-find of the pair graph."""
    docs = spark.read.parquet(f"{sf01}/documents.parquet")
    sigs = textdedup.minhash_signatures(docs, n_bands=4)
    pairs = textdedup.lsh_candidate_pairs(sigs)
    edge_rows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    expected = _uf_components(edge_rows)
    got = dup_clusters(pairs).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in got} == expected
    by_cluster: dict[int, list] = {}
    for r in got:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        assert all(m["cluster_size"] == len(members) for m in members)


def test_simhash_near_pairs_matches_bruteforce(spark, sf01):
    """the pigeonhole-banded equi-join must produce EXACTLY the all-pairs
    hamming-filter result (banding is a pruning strategy, never a
    semantics change) — stronger than the histogram oracle the displaced
    simhash_hamming_hist contract entry carried."""
    docs = spark.read.parquet(f"{sf01}/documents.parquet")
    fps = textdedup.simhash_fingerprints(docs, bits=16)
    local = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    ids = sorted(local)
    brute = {
        (a, b, bin(local[a] ^ local[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(local[a] ^ local[b]).count("1") <= 2
    }
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in textdedup.simhash_near_pairs(fps, max_hamming=2, bits=16).collect()
    }
    assert banded == brute
    assert len(brute) > 0  # the corpus actually exercises the path
