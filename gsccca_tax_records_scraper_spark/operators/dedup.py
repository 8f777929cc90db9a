"""Frontier URL dedup: J1 as a bloom-prefiltered exact anti-join (SURVEY J1/T2).

Reference semantics: keep the FIRST occurrence of each URL, in discovery
order (ordered-dict dedup realestate_index_scraper.py:474; drop_duplicates
:510). Scale design (north_star):

  one shuffle   candidates repartition on host_bucket (= url_id % shards —
                hash-balanced, no host skew) into a cogroup with the
                seen_state filter partitions. Inside each group (pandas,
                vectorized): (a) in-batch keep-first — every duplicate of a
                url_id lands in the same group because the bucket is a pure
                function of url_id, so a group-local sort+drop_duplicates IS
                the global keep-first; (b) blocked-Bloom probe — negatives
                are DEFINITELY new, positives are "maybe".
  small join    maybe-rows (~ the true-seen fraction + Bloom fpr) resolve by
                exact left_anti against seen_exact on (host_bucket, url_id,
                url); at 10^10 urls this join never sees the bulk.
  state update  second cogroup inserts confirmed-new ids into bloom+cuckoo;
                only touched host_buckets rewrite.

The decision is EXACT (filters only skip work, never claim "seen"). The
cuckoo table is not probed on this hot path — it is maintained for the
deletion/recrawl-revocation capability (north_star): removing a url from the
bloom is impossible, from the cuckoo it is an O(1) fingerprint delete.
Struct columns are flattened to scalars across the Arrow boundary and
rebuilt after — structs-through-pandas cost ~2x in serialization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import seenset

_ORDER_COLS = [
    "crawl_order.depth",
    "crawl_order.seed_id",
    "crawl_order.page",
    "crawl_order.link_order",
    "url_id",
]
_FLAT_ORDER = ["co_depth", "co_seed_id", "co_page", "co_link_order", "url_id"]
_FLAT_SCHEMA = (
    "url_id long, url string, host string, host_bucket int, priority double, "
    "co_seed_id long, co_page int, co_link_order int, co_depth int, "
    "status string, lin_parent long, lin_seed long, lin_depth int, lin_epoch int"
)
_STATE_SCHEMA = "host_bucket int, bloom binary, cuckoo binary, n_items long, epoch int"


def order_cols() -> list:
    """The total grant/dedup order (matches simulator.order_key)."""
    return [F.col(c) for c in _ORDER_COLS]


def _flatten(df: DataFrame) -> DataFrame:
    return df.select(
        "url_id", "url", "host", "host_bucket", "priority",
        F.col("crawl_order.seed_id").alias("co_seed_id"),
        F.col("crawl_order.page").alias("co_page"),
        F.col("crawl_order.link_order").alias("co_link_order"),
        F.col("crawl_order.depth").alias("co_depth"),
        "status",
        F.col("lineage.parent_url_id").alias("lin_parent"),
        F.col("lineage.seed_id").alias("lin_seed"),
        F.col("lineage.depth").alias("lin_depth"),
        F.col("lineage.discovered_epoch").alias("lin_epoch"),
    )


def _unflatten(df: DataFrame) -> DataFrame:
    return df.select(
        "url_id", "url", "host", "host_bucket", "priority",
        F.struct(
            F.col("co_seed_id").alias("seed_id"),
            F.col("co_page").alias("page"),
            F.col("co_link_order").alias("link_order"),
            F.col("co_depth").alias("depth"),
        ).alias("crawl_order"),
        "status",
        F.struct(
            F.col("lin_parent").alias("parent_url_id"),
            F.col("lin_seed").alias("seed_id"),
            F.col("lin_depth").alias("depth"),
            F.col("lin_epoch").alias("discovered_epoch"),
        ).alias("lineage"),
    )


def keep_first_in_batch(candidates: DataFrame) -> DataFrame:
    """Standalone stage-1 (used by the contract surface): one row per
    url_id, the first by crawl order."""
    w = Window.partitionBy("url_id").orderBy(*order_cols())
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _probe_fn():
    """Cogroup body: blocked-Bloom probe. Input (host_bucket, url_id) only;
    output ONLY the bloom-positive ("maybe seen") url_ids — at a healthy fpr
    that's the true-seen fraction plus ~0.5%, so the Arrow traffic back to
    the JVM stays tiny."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"url_id": pd.Series([], dtype="int64")})
        bloom = seenset.BlockedBloom.from_bytes(bytes(right["bloom"].iloc[0]))
        hit = bloom.contains(left["url_id"].to_numpy(dtype="uint64"))
        return pd.DataFrame({"url_id": left["url_id"][hit]})

    return fn


def _insert_fn(epoch: int):
    def insert(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty and right.empty:
            return pd.DataFrame(
                columns=["host_bucket", "bloom", "cuckoo", "n_items", "epoch"]
            )
        if right.empty:
            bloom_b, cuckoo_b = seenset.new_state_bytes()
            bloom = seenset.BlockedBloom.from_bytes(bloom_b)
            cuckoo = seenset.CuckooFilter.from_bytes(cuckoo_b)
            bucket = int(left["host_bucket"].iloc[0])
        else:
            bloom = seenset.BlockedBloom.from_bytes(bytes(right["bloom"].iloc[0]))
            cuckoo = seenset.CuckooFilter.from_bytes(bytes(right["cuckoo"].iloc[0]))
            bucket = int(right["host_bucket"].iloc[0])
        if not left.empty:
            ids = left["url_id"].to_numpy(dtype="uint64")
            bloom.insert(ids)
            cuckoo.insert(ids)
        return pd.DataFrame(
            {
                "host_bucket": [bucket],
                "bloom": [bloom.to_bytes()],
                "cuckoo": [cuckoo.to_bytes()],
                "n_items": [int(bloom.n_items)],
                "epoch": [epoch],
            }
        )

    return insert


def dedup_candidates(
    candidates: DataFrame,
    seen_exact: DataFrame | None,
    seen_state: DataFrame | None,
    epoch: int,
) -> tuple[DataFrame, DataFrame]:
    """Returns (new_rows, full_seen_state_snapshot_for_epoch).

    `candidates` is FRONTIER-shaped. `seen_exact` has (host_bucket, url_id,
    url); `seen_state` is SEEN_STATE-shaped (None on the first epoch).
    new_rows is persisted (it feeds the insert cogroup and the caller's
    writes); callers unpersist when done.
    """
    spark = candidates.sparkSession
    flat = _flatten(candidates)

    # stage 1 (JVM, map-side combined): keep-first = min(struct) per url_id,
    # order fields leading the struct so lexicographic min == crawl order min
    payload = [c for c in flat.columns if c not in ("url_id", *_FLAT_ORDER[:-1])]
    packed = flat.select(
        "url_id",
        F.struct(*[F.col(c) for c in _FLAT_ORDER[:-1]], *[F.col(c) for c in payload]).alias(
            "__s"
        ),
    )
    first = (
        packed.groupBy("url_id").agg(F.min("__s").alias("__s")).select("url_id", "__s.*")
    ).persist()

    state_src = (
        seen_state
        if seen_state is not None
        else spark.createDataFrame([], _STATE_SCHEMA)
    )

    if seen_exact is not None:
        # stage 2 (python, slim): bloom-positive ids only
        maybe_ids = (
            first.select("host_bucket", "url_id")
            .groupBy("host_bucket")
            .cogroup(state_src.groupBy("host_bucket"))
            .applyInPandas(_probe_fn(), "url_id long")
        )
        # stage 3 (JVM): exact resolve — truly-seen = maybes ∩ seen_exact,
        # then anti-join the candidates against that (small) set
        maybe_rows = first.join(maybe_ids, "url_id", "left_semi")
        truly_seen = maybe_rows.select("host_bucket", "url_id", "url").join(
            seen_exact.select("host_bucket", "url_id", "url"),
            ["host_bucket", "url_id", "url"],
            "left_semi",
        )
        new_flat = first.join(truly_seen, ["host_bucket", "url_id", "url"], "left_anti").persist()
    else:
        new_flat = first

    # stage 4 (python, slim): insert confirmed-new into bloom+cuckoo
    updated_state = (
        new_flat.select("host_bucket", "url_id")
        .groupBy("host_bucket")
        .cogroup(state_src.groupBy("host_bucket"))
        .applyInPandas(_insert_fn(epoch), _STATE_SCHEMA)
        .filter(F.col("host_bucket").isNotNull())
    )
    return _unflatten(new_flat), updated_state
