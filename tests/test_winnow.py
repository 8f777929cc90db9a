"""Winnowing fingerprints (operators/winnow): exact parity against an
independent sequential-rolling reference, the winnowing coverage
guarantee, edit locality, and the Spark operator surface."""

from __future__ import annotations

import random

import numpy as np
import pytest

from gsccca_tax_records_scraper_spark.operators import winnow


def _ref_hashes(text: str, k: int) -> list[int]:
    """Sequential Horner-rule rolling reference (independent of the
    vectorized stride-view implementation)."""
    codes = [ord(c) for c in text]
    out = []
    for i in range(len(codes) - k + 1):
        h = 0
        for c in codes[i : i + k]:
            h = (h * winnow.BASE + c) % winnow.MOD
        out.append(h)
    return out


def _ref_winnow(text: str, k: int, w: int) -> dict[int, int]:
    h = _ref_hashes(text, k)
    if not h:
        return {}
    if len(h) < w:
        m = min(h)
        pos = max(i for i, v in enumerate(h) if v == m)
        return {pos: m}
    sel: dict[int, int] = {}
    for i in range(len(h) - w + 1):
        window = h[i : i + w]
        m = min(window)
        pos = i + max(j for j, v in enumerate(window) if v == m)
        sel[pos] = m
    return sel


@pytest.mark.parametrize("k,w", [(4, 5), (8, 16), (3, 1), (5, 50)])
def test_parity_vs_sequential_reference(k, w):
    rng = random.Random(42)
    for _ in range(20):
        n = rng.randrange(0, 200)
        text = "".join(rng.choice("abcdef 一二三") for _ in range(n))
        pos, fps = winnow.winnow_one(text, k, w)
        ref = _ref_winnow(text, k, w)
        assert {int(p): int(f) for p, f in zip(pos, fps)} == ref


def test_coverage_guarantee():
    # every window of w consecutive k-grams contains >= 1 selected position
    rng = random.Random(7)
    k, w = 5, 9
    for _ in range(10):
        text = "".join(rng.choice("abcdefgh") for _ in range(rng.randrange(60, 400)))
        pos, _ = winnow.winnow_one(text, k, w)
        n = len(text) - k + 1
        chosen = set(int(p) for p in pos)
        for i in range(n - w + 1):
            assert chosen & set(range(i, i + w)), f"window {i} uncovered"


def test_edit_locality():
    # a single-character edit perturbs only fingerprints near the edit
    base = "the quick brown fox jumps over the lazy dog " * 8
    k, w = 8, 16
    edit_at = 180
    edited = base[:edit_at] + "X" + base[edit_at + 1 :]
    a = {int(p): int(f) for p, f in zip(*winnow.winnow_one(base, k, w))}
    b = {int(p): int(f) for p, f in zip(*winnow.winnow_one(edited, k, w))}
    # fingerprints whose k-gram AND window lie entirely before/after the
    # edit's influence zone are bit-identical
    lo, hi = edit_at - k - w, edit_at + w
    far_a = {p: f for p, f in a.items() if p < lo or p > hi}
    assert far_a and all(b.get(p) == f for p, f in far_a.items())


def test_lone_surrogate_parity():
    # upstream surrogateescape decoding can leave lone surrogates in text;
    # they must fingerprint (matching ord()-based hashing), not crash
    text = "abcdefgh\ud800xyz and more text after the surrogate padding"
    pos, fps = winnow.winnow_one(text, 4, 4)
    assert {int(p): int(f) for p, f in zip(pos, fps)} == _ref_winnow(text, 4, 4)


def test_k_bound_asserted():
    # beyond MAX_K the int64 sum can overflow silently: the envelope is
    # enforced with a raise that survives PYTHONOPTIMIZE-stripped workers
    with pytest.raises(ValueError):
        winnow.winnow_one("x" * 20000, k=winnow.MAX_K + 1, w=4)
    # at the bound itself, parity still holds on astral-plane text
    text = chr(0x10FFFF) * 1200
    pos, fps = winnow.winnow_one(text, winnow.MAX_K, 4)
    ref = _ref_winnow(text, winnow.MAX_K, 4)
    assert {int(p): int(f) for p, f in zip(pos, fps)} == ref


def test_hash_values_are_polynomial_codes():
    # spot-check the hash definition itself: h("ab") = ord('a')*B + ord('b')
    h = winnow._kgram_hashes("ab", 2)
    assert int(h[0]) == (ord("a") * winnow.BASE + ord("b")) % winnow.MOD


def test_spark_operator_and_pair_join(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog, said the farmer",
        2: "an unrelated document about spark shuffle partitioning at scale",
        # 3 plagiarizes a long span of 1
        3: "INTRO: the quick brown fox jumps over the lazy dog, said she",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    fps = winnow.winnow_fingerprints(df, k=8, w=4).cache()
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    # parity with the local function, through the Spark surface
    for i, t in texts.items():
        pos, f = winnow.winnow_one(t, 8, 4)
        assert by_doc[i] == {(int(p), int(v)) for p, v in zip(pos, f)}
    # copy-detection join: 1 and 3 share fingerprints, 2 shares none
    a = fps.select("doc_id", "fp").alias("a")
    b = fps.select("doc_id", "fp").alias("b")
    pairs = (
        a.join(b, "fp")
        .where("a.doc_id < b.doc_id")
        .groupBy("a.doc_id", "b.doc_id")
        .count()
        .collect()
    )
    shared = {(r["doc_id"], r["b.doc_id"] if "b.doc_id" in r.asDict() else r[1]): r["count"] for r in pairs}
    keys = {(k[0], k[1]) for k in shared}
    assert (1, 3) in keys
    assert not any(2 in k for k in keys)


def test_winnow_overlap_pairs(spark):
    boiler = " COPYRIGHT 2026 ALL RIGHTS RESERVED IN FULL "
    texts = {
        1: "the quick brown fox jumps over the lazy dog, said the farmer" + boiler,
        2: "an unrelated document about spark shuffle partitioning" + boiler,
        3: "PREFIX: the quick brown fox jumps over the lazy dog, said she" + boiler,
        4: "another unrelated text on parquet row group statistics" + boiler,
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    # max_df=2: the boilerplate fingerprints (df=4) are stop-fps and count
    # toward NO pair, so only the real plagiarism pair (1,3) survives
    pairs = winnow.winnow_overlap_pairs(df, min_common=2, k=8, w=4, max_df=2).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 3)}
    assert all(r.n_common >= 2 for r in pairs)
    # with the window open to df=4, boilerplate links every doc pair
    wide = winnow.winnow_overlap_pairs(df, min_common=2, k=8, w=4, max_df=64).collect()
    assert {(r.doc_a, r.doc_b) for r in wide} >= {(1, 2), (1, 3), (2, 4)}


def test_winnow_pairs_plan_shape(spark):
    """Pair generation is posting-list style — no cartesian / nested-loop
    pair join appears anywhere in the plan (same evidence the ngram and
    simhash ladders carry in test_plan_shapes)."""
    df = spark.createDataFrame(
        [(i, f"document number {i} with shared tail text") for i in range(6)],
        "doc_id long, text string",
    )
    from conftest import explain

    pairs = winnow.winnow_overlap_pairs(df, min_common=1, k=6, w=4)
    plan = explain(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, "abcdefghij")], "doc_id long, text string"
    )
    rows = winnow.winnow_fingerprints(df, k=4, w=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc  # no k-gram
    assert 2 not in by_doc  # len 3 < k
    assert len(by_doc[3]) == 1  # 7 k-grams < w -> single global min
