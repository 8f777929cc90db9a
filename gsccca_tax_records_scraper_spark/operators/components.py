"""Connected components over a near-duplicate pair graph: the step that
turns the dedup ladder's PAIRS (minhash/simhash/ngram/cosine candidates)
into duplicate CLUSTERS with a canonical representative per cluster —
"keep one doc per cluster" is the final operation of every training-data
dedup pipeline, and the reference's keep-first dedup
(realestate_index_scraper.py:474,510) is exactly this with singleton
pair groups (equality edges only).

Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014) — the standard shuffle-native CC formulation:

  large-star  for each node u, hang every LARGER neighbor off
              m(u) = min(neighbors(u) + [u]);
  small-star  orient edges high->low, then hang every SMALLER-or-equal
              neighbor (and u itself) off m(u).

Both steps preserve connectivity, strictly shrink the potential function,
and converge in O(log^2 n) rounds (O(log n) in practice — near-dup graphs
are dense unions of cliques from the pair generators' bucket expansion,
so 2-4 rounds are typical: each bucket's pairs already form a clique).
At the fixpoint the edge set IS a star forest rooted at each component's
minimum node id, which makes cluster_id = min(doc_id) with no extra pass.

Scale shape (the reason for this formulation over label propagation):
every round is groupBy(min) + equi-join + distinct — partial-aggregated,
skew-tolerant (AQE splits a hot hub's join side; the min-agg combines
map-side regardless of degree), no collect_list of neighbor sets, and
the round count is logarithmic in the LONGEST CHAIN, not linear like
naive min-label flooding (a 10^6-node chain floods in 10^6 rounds,
star-contracts in ~20). Per-round driver work is one bounded boolean
action (the convergence probe); edges are localCheckpoint'd each round
so the iterative plan never compounds (the same Catalyst-lineage lesson
bench.py's growth harness learned: re-executing a round-N plan from
scratch is O(N) work per action).

Everything is built-in pyspark.sql.functions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# convergence is provable (the potential strictly decreases), so this is a
# pure bug-guard; 64 rounds covers graphs with chains of ~2^64 nodes
MAX_ROUNDS = 64


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) edges -> for every node u: attach each neighbor v > u to
    m(u) = min(neighbors + self). Emitted edges always point STRICTLY
    downward (__m <= u < v), so no self-loop can appear."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("__mn"))
    m = m.select("u", F.least("u", "__mn").alias("__m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient high->low, then for every node u: attach each (smaller)
    neighbor AND u itself to m(u) = min(neighbors) — all neighbors are
    < u after orientation, so min(neighbors) == min(neighbors + self)."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = o.groupBy("u").agg(F.min("v").alias("__m"))
    nbr = o.join(m, "u").select(F.col("v").alias("u"), F.col("__m").alias("v"))
    own = m.select("u", F.col("__m").alias("v"))
    return nbr.unionByName(own).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`, where
    `component` is the smallest node id in its connected component —
    deterministic, partition-layout-independent cluster labels.

    `pairs` is an undirected edge list (duplicate and reversed edges are
    fine; self-pairs are ignored). The convergence probe per round is one
    bounded boolean action (is the symmetric difference of two edge sets
    empty) — at corpus scale a (count, sum-of-hash) checksum comparison
    avoids the probe's extra join at the cost of an astronomically
    unlikely false stop; this implementation keeps the exact probe
    because its cost is a fraction of the round it guards."""
    # nodes comes from `pairs`, NOT from the checkpointed edge frame (the
    # edge frame drops self-pair-only nodes, and the loop's superseded
    # checkpoints cannot recompute once the ContextCleaner reaps their
    # blocks), and is checkpointed itself so the final left join does not
    # re-execute the entire upstream pair-generation lineage a second time
    nodes = (
        pairs.select(F.col(a_col).alias("u"))
        .unionByName(pairs.select(F.col(b_col).alias("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(MAX_ROUNDS):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        converged = e2.exceptAll(e).unionByName(e.exceptAll(e2)).isEmpty()
        # e2 is eagerly materialized, so nothing reads e again: rebinding
        # drops the old checkpoint's last reference and the ContextCleaner
        # reclaims its blocks (df.unpersist() would be a no-op here — the
        # blocks belong to the checkpoint RDD, not the query cache)
        e = e2
        if converged:
            break
    else:  # pragma: no cover - the potential function forbids this
        raise RuntimeError(f"connected_components: no fixpoint in {MAX_ROUNDS} rounds")
    # fixpoint edge set = star forest (leaf -> component min), one edge per
    # leaf; roots and isolated nodes map to themselves
    stars = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.select(F.col("u").alias("node"))
        .join(stars, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def dup_clusters(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every doc in at least one
    near-dup pair: cluster_id = min doc_id of the component (the canonical
    KEEP candidate — a doc is canonical iff doc_id == cluster_id),
    cluster_size = docs in the cluster. One extra shuffle (the window
    count on cluster_id) beyond the components themselves."""
    comp = connected_components(pairs, a_col, b_col)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
    )
