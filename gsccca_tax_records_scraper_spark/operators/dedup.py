"""Frontier URL dedup: J1 as a bloom-prefiltered exact anti-join (SURVEY J1/T2).

Reference semantics: keep the FIRST occurrence of each URL, in discovery
order (ordered-dict dedup realestate_index_scraper.py:474; drop_duplicates
:510). Scale design (north_star):

  stage 1 (JVM)  keep-first = min(order-struct) per url_id with map-side
                 partial aggregation — ONE shuffle on url_id, hash-balanced,
                 no host skew.
  stage 2 (one   candidates' slim keys (host_bucket, url_id, xxhash64(url))
  cogroup)       union'd with the seen set's slim keys cogroup with the
                 per-bucket filter state; inside each group (numpy/pandas):
                 (a) blocked-Bloom probe — negatives are DEFINITELY new;
                 (b) positives resolve EXACTLY against the bucket's seen keys
                     (128-bit identity: 60-bit sha1 url_id + independent
                     64-bit xxhash64 — collision odds ~1e-18 at 10^10 urls);
                 (c) confirmed-new ids insert into bloom+cuckoo (sorted first
                     so the state bytes are partition-layout-independent);
                 (d) a bucket whose filters would overflow REBUILDS them at
                     doubled capacity from the seen+new ids in hand.
                 Output = new url_ids + one updated state row per bucket —
                 ONE shuffle on host_bucket, ONE JVM<->Python crossing.
  stage 3 (JVM)  left-semi join of the kept-first rows against the new ids
                 returns the admitted frontier rows with full payload.

Per epoch that is 2 shuffles + 1 semi-join, vs 2 cogroups + 3 joins in the
unfused design — the fixed per-epoch stage count is what throttled N->4N
scaling efficiency. The decision remains exact w.r.t. the seen SET; the
filters only skip work (bloom-negative skips the resolve), never claim
"seen" on their own. The cuckoo table is maintained for the deletion /
recrawl-revocation capability (north_star): removing a url from a bloom is
impossible, from the cuckoo it is an O(1) fingerprint delete.

At 10^10 urls the seen keys are 16 bytes/row; shipping a bucket's keys
through Arrow is the same order as the JVM shuffle the exact-resolve join
needed anyway, and storage-bucketing seen_exact by host_bucket removes even
that shuffle on a real cluster (parquet written per-bucket; the cogroup then
reads co-located partitions).
"""

from __future__ import annotations

import numpy as np
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


_OUT_SCHEMA = (
    "host_bucket int, url_id long, bloom binary, cuckoo binary, n_items long, epoch int"
)


def _fused_fn(epoch: int, capacity: int):
    """Cogroup body: probe + exact-resolve + insert (+ rebuild on overflow).
    left = slim keys (host_bucket, url_id, url_h, is_seen); right = the
    bucket's state row. Returns new-candidate key rows (state columns NULL)
    plus exactly one state row (url_id NULL)."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty and right.empty:
            return pd.DataFrame(
                {
                    "host_bucket": pd.Series([], dtype="int32"),
                    "url_id": pd.Series([], dtype="int64"),
                    "bloom": pd.Series([], dtype="object"),
                    "cuckoo": pd.Series([], dtype="object"),
                    "n_items": pd.Series([], dtype="int64"),
                    "epoch": pd.Series([], dtype="int32"),
                }
            )
        if right.empty:
            bloom = seenset.BlockedBloom.for_capacity(capacity)
            cuckoo = seenset.CuckooFilter.for_capacity(capacity)
            bucket = int(left["host_bucket"].iloc[0])
        else:
            bloom = seenset.BlockedBloom.from_bytes(bytes(right["bloom"].iloc[0]))
            cuckoo = seenset.CuckooFilter.from_bytes(bytes(right["cuckoo"].iloc[0]))
            bucket = int(right["host_bucket"].iloc[0])

        if left.empty:
            new_ids = np.zeros(0, dtype="int64")
            seen_ids = np.zeros(0, dtype="int64")
            seen_h = np.zeros(0, dtype="int64")
        else:
            is_seen = left["is_seen"].to_numpy(dtype=bool)
            cand = left[~is_seen]
            seen_ids = left["url_id"].to_numpy(dtype="int64")[is_seen]
            seen_h = left["url_h"].to_numpy(dtype="int64")[is_seen]
            cand_ids = cand["url_id"].to_numpy(dtype="int64")
            cand_h = cand["url_h"].to_numpy(dtype="int64")
            # (a) bloom probe: negatives are definitely new
            maybe = bloom.contains(cand_ids.view(np.uint64))
            # (b) exact resolve of the maybes against the seen 128-bit keys
            if maybe.any() and len(seen_ids):
                key_seen = pd.MultiIndex.from_arrays([seen_ids, seen_h])
                key_maybe = pd.MultiIndex.from_arrays([cand_ids[maybe], cand_h[maybe]])
                truly_seen = key_maybe.isin(key_seen)
                resolved_new = cand_ids[maybe][~truly_seen]
            else:
                resolved_new = cand_ids[maybe]
            new_ids = np.concatenate([cand_ids[~maybe], resolved_new])

        # (c)/(d) insert, rebuilding at doubled capacity on overflow; ids are
        # sorted first so state bytes are independent of partition layout
        total = bloom.n_items + len(new_ids)
        if total > bloom.capacity:
            cap = bloom.capacity
            while total > cap:
                cap *= 2
            bloom = seenset.BlockedBloom.for_capacity(cap)
            cuckoo = seenset.CuckooFilter.for_capacity(cap)
            all_ids = np.sort(np.concatenate([seen_ids, new_ids])).view(np.uint64)
            bloom.insert(all_ids)
            cuckoo.insert(all_ids)
        elif len(new_ids):
            ins = np.sort(new_ids).view(np.uint64)
            bloom.insert(ins)
            cuckoo.insert(ins)

        out = pd.DataFrame(
            {
                "host_bucket": np.full(len(new_ids), bucket, dtype="int32"),
                "url_id": new_ids,
                "bloom": None,
                "cuckoo": None,
                "n_items": np.zeros(len(new_ids), dtype="int64"),
                "epoch": np.zeros(len(new_ids), dtype="int32"),
            }
        )
        state_row = pd.DataFrame(
            {
                "host_bucket": [bucket],
                "url_id": [None],
                "bloom": [bloom.to_bytes()],
                "cuckoo": [cuckoo.to_bytes()],
                "n_items": [int(bloom.n_items)],
                "epoch": [epoch],
            }
        )
        return pd.concat([out, state_row], ignore_index=True)

    return fn


def dedup_candidates(
    candidates: DataFrame,
    seen_exact: DataFrame | None,
    seen_state: DataFrame | None,
    epoch: int,
    capacity: int = seenset.DEFAULT_PARTITION_CAPACITY,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """Returns (new_rows, full_seen_state_snapshot_for_epoch, persisted).

    `candidates` is FRONTIER-shaped. `seen_exact` has (host_bucket, url_id,
    url[, ...]); `seen_state` is SEEN_STATE-shaped (None on the first epoch).
    `persisted` are the frames this call cached internally — callers MUST
    unpersist them once new_rows/state have been consumed (the engine does;
    never clear the session-wide cache, other users' frames live there too).
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
    cand_keys = first.select(
        "host_bucket", "url_id", F.xxhash64("url").alias("url_h"),
        F.lit(False).alias("is_seen"),
    )
    if seen_exact is not None:
        seen_keys = seen_exact.select(
            "host_bucket", "url_id", F.xxhash64("url").alias("url_h"),
            F.lit(True).alias("is_seen"),
        )
        cand_keys = cand_keys.unionByName(seen_keys)

    # stage 2: ONE cogroup does probe + exact resolve + insert (+ rebuild)
    out = (
        cand_keys.groupBy("host_bucket")
        .cogroup(state_src.groupBy("host_bucket"))
        .applyInPandas(_fused_fn(epoch, capacity), _OUT_SCHEMA)
        .persist()
    )
    updated_state = out.filter(F.col("url_id").isNull() & F.col("host_bucket").isNotNull()).select(
        "host_bucket", "bloom", "cuckoo", "n_items", "epoch"
    )
    # stage 3 (JVM): admitted rows = kept-first rows whose url_id came back new
    new_flat = first.join(
        out.filter(F.col("url_id").isNotNull()).select("url_id"), "url_id", "left_semi"
    )
    return _unflatten(new_flat), updated_state, [first, out]
