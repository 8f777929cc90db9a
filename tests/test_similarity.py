"""ANN operators: approximate variants must agree with brute force on
recall, and the brute-force result is itself oracle-checked in the driver
contract (cosine_topk_bruteforce)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf001):
    return spark.read.parquet(f"{sf001}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_bruteforce_self_is_top1(emb, queries):
    bf = similarity.brute_force_topk(emb, queries, k=3)
    for r in bf.filter(F.col("rank") == 1).collect():
        assert r.vec_id == r.query_id  # self-similarity = 1.0
        assert r.cos == pytest.approx(1.0, abs=1e-6)


def test_lsh_recall_vs_bruteforce(emb, queries):
    bf = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    lsh = _topk_sets(similarity.lsh_topk(emb, queries, k=5, n_planes=4))
    recalls = [len(bf[q] & lsh.get(q, set())) / len(bf[q]) for q in bf]
    assert sum(recalls) / len(recalls) >= 0.3  # approximate, bucketed
    # every LSH hit must be a genuine vector id
    assert all(len(v) <= 5 for v in lsh.values())


def test_ivf_recall_vs_bruteforce(emb, queries):
    bf = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    ivf = _topk_sets(similarity.ivf_topk(emb, queries, k=5, n_cells=4, nprobe=2))
    recalls = [len(bf[q] & ivf.get(q, set())) / len(bf[q]) for q in bf]
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivf_probe_reduces_candidates(emb, queries):
    # with nprobe == n_cells IVF degenerates to brute force
    full = similarity.ivf_topk(emb, queries, k=3, n_cells=4, nprobe=4)
    bf = similarity.brute_force_topk(emb, queries, k=3)
    assert _topk_sets(full) == _topk_sets(bf)


def test_ivf_trained_centroids_on_clustered_data(spark):
    """k-means-trained centroids must recover cluster structure: on a
    clustered corpus IVF recall@5 with nprobe=2/8 cells reaches >= 0.8,
    and beats the untrained random-direction seeding. (The sf embeddings
    are near-isotropic, which caps any cell-pruned recall — cluster
    recovery is the property that matters at scale.)"""
    import numpy as np

    rs = np.random.RandomState(3)
    centers = rs.normal(size=(8, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = centers[i % 8]
        v = c + 0.15 * rs.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    ivf_t = _topk_sets(
        similarity.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=2, train=True)
    )
    ivf_r = _topk_sets(
        similarity.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=2, train=False)
    )
    rec_t = sum(len(bf[q] & ivf_t.get(q, set())) / len(bf[q]) for q in bf) / len(bf)
    rec_r = sum(len(bf[q] & ivf_r.get(q, set())) / len(bf[q]) for q in bf) / len(bf)
    assert rec_t >= 0.8, rec_t
    assert rec_t >= rec_r, (rec_t, rec_r)


def test_distributed_lloyd_refinement(spark):
    """train_ivf_centroids_full (the 100-TB training path): on a clustered
    corpus the distributed Lloyd iterations recover the cluster structure
    at least as well as the sampled trainer (recall@5 >= 0.8 with
    nprobe=2/8 cells), every centroid stays unit-norm, extra cells beyond
    the cluster count survive (empty cells keep their previous centroid —
    no NaN), and training is deterministic."""
    import numpy as np

    rs = np.random.RandomState(7)
    centers = rs.normal(size=(8, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = centers[i % 8]
        v = c + 0.15 * rs.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = similarity.train_ivf_centroids_full(emb, n_cells=8, iters=5)
    assert len(cents) == 8
    for c in cents:
        assert abs(float(np.linalg.norm(c)) - 1.0) < 1e-9
    bf = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    ivf = _topk_sets(
        similarity.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=2, centroids=cents)
    )
    rec = sum(len(bf[q] & ivf.get(q, set())) / len(bf[q]) for q in bf) / len(bf)
    assert rec >= 0.8, rec
    # determinism: the refinement is a fixed function of (seed, input)
    again = similarity.train_ivf_centroids_full(emb, n_cells=8, iters=5)
    assert cents == again
    # empty-cell stability: more cells than clusters must not produce NaN
    wide = similarity.train_ivf_centroids_full(emb, n_cells=12, iters=3, cache=False)
    assert all(np.isfinite(c).all() for c in np.array(wide))


def test_neardup_pairs_properties(emb):
    """Every reported pair is ordered, unique, and truly >= threshold;
    the candidate pruning never invents a pair that brute force (same
    threshold) doesn't also contain."""
    th = 0.35
    got = similarity.cosine_neardup_pairs(emb, threshold=th).collect()
    keys = [(r.a_id, r.b_id) for r in got]
    assert len(keys) == len(set(keys))  # distinct pairs
    assert all(a < b for a, b in keys)
    assert all(r.cos >= th for r in got)
    # brute-force superset check: banded LSH must be a SUBSET of the true
    # near-dup pair set (it prunes, never fabricates)
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    bf = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            similarity.cosine_col(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= th)
    )
    truth = {(r.a_id, r.b_id) for r in bf.collect()}
    assert set(keys) <= truth
    assert len(keys) > 0  # nonzero at sf0.001 with th=0.35


def test_neardup_planted_duplicates_found(spark):
    """Identical vectors agree on every band, so exact duplicates are found
    with recall 1.0 regardless of banding; near-identical ones (tiny noise)
    are found too."""
    import numpy as np

    rs = np.random.RandomState(7)
    base = rs.normal(size=(50, 64))
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
    # plant: 50+i == exact dup of i (i<5), 60+i == i + tiny noise (i<5)
    for i in range(5):
        rows.append((50 + i, [float(x) for x in base[i]]))
        rows.append((60 + i, [float(x) for x in base[i] + 0.01 * rs.normal(size=64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.a_id, r.b_id) for r in
           similarity.cosine_neardup_pairs(emb, threshold=0.95).collect()}
    for i in range(5):
        assert (i, 50 + i) in got, f"exact dup {i} missed"
        assert (i, 60 + i) in got, f"near dup {i} missed"


def test_neardup_max_bucket_prunes_dense_clusters(spark):
    """max_bucket drops over-dense buckets (dup clusters) from pair
    emission while sparse-bucket pairs survive."""
    import numpy as np

    rs = np.random.RandomState(11)
    hub = rs.normal(size=64)
    rows = [(i, [float(x) for x in hub + 0.01 * rs.normal(size=64)])
            for i in range(30)]  # one dense cluster: all 30 share buckets
    spoke = rs.normal(size=64)
    rows += [(100, [float(x) for x in spoke]),
             (101, [float(x) for x in spoke])]  # one sparse exact pair
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = {(r.a_id, r.b_id) for r in similarity.cosine_neardup_pairs(
        emb, threshold=0.9, max_bucket=5).collect()}
    assert (100, 101) in capped
    assert not any(a < 30 and b < 30 for a, b in capped)  # cluster dropped
    uncapped = {(r.a_id, r.b_id) for r in similarity.cosine_neardup_pairs(
        emb, threshold=0.9).collect()}
    assert any(a < 30 and b < 30 for a, b in uncapped)
