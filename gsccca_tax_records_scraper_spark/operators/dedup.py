"""Frontier URL dedup: J1 as a bloom-prefiltered exact anti-join (SURVEY J1/T2).

Reference semantics: keep the FIRST occurrence of each URL, in discovery
order (ordered-dict dedup realestate_index_scraper.py:474; drop_duplicates
:510). Scale design (north_star):

  ONE cogroup   candidates (full payload, flattened) union'd with the seen
                set's slim keys, cogrouped on host_bucket with the bucket's
                filter state. host_bucket is a pure function of url_id, so
                every duplicate of a url lands in the same group. Inside
                (numpy/pandas, vectorized):
                (a) keep-first: np.lexsort on (url_id, depth, seed, page,
                    link_order, parent) + first-occurrence mask — the
                    group-local keep-first IS the global keep-first;
                (b) blocked-Bloom probe — negatives are DEFINITELY new;
                (c) positives resolve EXACTLY against the bucket's seen keys
                    (128-bit identity: 60-bit sha1 url_id + independent
                    64-bit xxhash64 — collision odds ~1e-18 at 10^10 urls);
                (d) confirmed-new ids insert into bloom+cuckoo (sorted first
                    so the state bytes are partition-layout-independent);
                (e) a bucket whose filters would overflow REBUILDS them at
                    doubled capacity from the seen+new ids in hand.
                Output = the kept-first NEW rows (full payload) + one state
                row per bucket.

Per epoch that is ONE shuffle and ONE JVM<->Python crossing, with no join
and no aggregation at all. The previous shapes — keep-first as a JVM
min(struct) groupBy + probe/insert cogroups + exact-resolve joins — lose to
this on two counts at any scale: min over a struct (or any var-width type)
compiles to SortAggregate, i.e. two full sorts of the batch per epoch, and
the extra stages' fixed costs throttled N->4N scaling efficiency. The
decision remains exact w.r.t. the seen SET; the filters only skip work
(bloom-negative skips the resolve), never claim "seen" on their own. The
cuckoo table is maintained for the deletion / recrawl-revocation capability
(north_star): removing a url from a bloom is impossible, from the cuckoo it
is an O(1) fingerprint delete.

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


_PAYLOAD_COLS = [
    "url_id", "url", "host", "host_bucket", "priority",
    "co_seed_id", "co_page", "co_link_order", "co_depth",
    "status", "lin_parent", "lin_seed", "lin_depth", "lin_epoch",
]
_OUT_SCHEMA = (
    _FLAT_SCHEMA + ", bloom binary, cuckoo binary, n_items long, epoch int"
)
_PAYLOAD_DTYPES = {
    "url_id": "int64", "url": "object", "host": "object", "host_bucket": "int32",
    "priority": "float64", "co_seed_id": "int64", "co_page": "int32",
    "co_link_order": "int32", "co_depth": "int32", "status": "object",
    "lin_parent": "int64", "lin_seed": "int64", "lin_depth": "int32",
    "lin_epoch": "int32",
}


def _fused_fn(epoch: int, capacity: int):
    """Cogroup body: keep-first + probe + exact-resolve + insert (+ rebuild
    on overflow). left = flattened candidate rows (full payload, is_seen
    False) union'd with the seen set's keys (payload zero-filled — nulls
    would demote int64 columns to float64 in pandas and corrupt 60-bit ids);
    right = the bucket's state row. Returns the kept-first NEW candidate
    rows (state columns NULL) plus exactly one state row (bloom non-NULL)."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty_payload = {c: pd.Series([], dtype="object") for c in _PAYLOAD_COLS}
        if left.empty and right.empty:
            out = pd.DataFrame(empty_payload)
            out["bloom"] = pd.Series([], dtype="object")
            out["cuckoo"] = pd.Series([], dtype="object")
            out["n_items"] = pd.Series([], dtype="int64")
            out["epoch"] = pd.Series([], dtype="int32")
            return out
        if right.empty:
            bloom = seenset.BlockedBloom.for_capacity(capacity)
            cuckoo = seenset.CuckooFilter.for_capacity(capacity)
            bucket = int(left["host_bucket"].iloc[0])
        else:
            bloom = seenset.BlockedBloom.from_bytes(bytes(right["bloom"].iloc[0]))
            cuckoo = seenset.CuckooFilter.from_bytes(bytes(right["cuckoo"].iloc[0]))
            bucket = int(right["host_bucket"].iloc[0])

        new_rows = None
        new_ids = np.zeros(0, dtype="int64")
        seen_ids = np.zeros(0, dtype="int64")
        if not left.empty:
            is_seen = left["is_seen"].to_numpy(dtype=bool)
            cand = left[~is_seen]
            seen_ids = left["url_id"].to_numpy(dtype="int64")[is_seen]
            seen_h = left["url_h"].to_numpy(dtype="int64")[is_seen]
            if len(cand):
                ids = cand["url_id"].to_numpy(dtype="int64")
                # (a) keep-first per url_id in total crawl order: lexsort
                # keys are listed minor-first, url_id last = primary
                order = np.lexsort(
                    (
                        cand["lin_parent"].to_numpy(dtype="int64"),
                        cand["co_link_order"].to_numpy(dtype="int64"),
                        cand["co_page"].to_numpy(dtype="int64"),
                        cand["co_seed_id"].to_numpy(dtype="int64"),
                        cand["co_depth"].to_numpy(dtype="int64"),
                        ids,
                    )
                )
                ids_sorted = ids[order]
                first_mask = np.empty(len(order), dtype=bool)
                first_mask[0] = True
                first_mask[1:] = ids_sorted[1:] != ids_sorted[:-1]
                kept_idx = order[first_mask]
                kept = cand.iloc[kept_idx]
                kept_ids = ids[kept_idx]
                # (b) bloom probe: negatives are definitely new
                maybe = bloom.contains(kept_ids.view(np.uint64))
                # (c) exact resolve of the maybes against the seen 128-bit keys
                if maybe.any() and len(seen_ids):
                    kept_h = kept["url_h"].to_numpy(dtype="int64")[maybe]
                    key_seen = pd.MultiIndex.from_arrays([seen_ids, seen_h])
                    key_maybe = pd.MultiIndex.from_arrays([kept_ids[maybe], kept_h])
                    truly_seen = key_maybe.isin(key_seen)
                    new_sel = ~maybe
                    new_sel[np.flatnonzero(maybe)[~truly_seen]] = True
                else:
                    # no seen keys in this bucket: any bloom positive is a
                    # false positive -> everything kept is new
                    new_sel = np.ones(len(kept_ids), dtype=bool)
                new_rows = kept[new_sel]
                new_ids = kept_ids[new_sel]

        # (d)/(e) insert, rebuilding at doubled capacity on overflow; ids are
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

        if new_rows is None or new_rows.empty:
            out = pd.DataFrame({c: pd.Series([], dtype=_PAYLOAD_DTYPES[c]) for c in _PAYLOAD_COLS})
        else:
            out = new_rows[_PAYLOAD_COLS].copy()
        out["bloom"] = None
        out["cuckoo"] = None
        out["n_items"] = 0
        out["epoch"] = 0
        # the state row's payload cells are TYPED ZEROS, not None: a None in
        # an int64/str column would degrade the whole concat to object dtype
        # and turn the pandas->Arrow conversion of the admitted rows into a
        # per-element crawl (measured ~10x of this function's real work).
        # State rows are identified by bloom IS NOT NULL; their payload
        # values are never read.
        state_row = pd.DataFrame(
            {
                c: pd.Series(["" if _PAYLOAD_DTYPES[c] == "object" else 0],
                             dtype=_PAYLOAD_DTYPES[c])
                for c in _PAYLOAD_COLS
            }
        )
        state_row["host_bucket"] = np.int32(bucket)
        state_row["bloom"] = [bloom.to_bytes()]
        state_row["cuckoo"] = [cuckoo.to_bytes()]
        state_row["n_items"] = np.int64(bloom.n_items)
        state_row["epoch"] = np.int32(epoch)
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
    # lin_parent is the only nullable int64 (seed rows have no parent): a
    # batch mixing nulls with 60-bit ids would cross Arrow as float64 and
    # silently corrupt the ids, so nulls ride as -1 and are restored after
    flat = _flatten(candidates).withColumn(
        "lin_parent", F.coalesce(F.col("lin_parent"), F.lit(-1).cast("long"))
    )
    cand_side = flat.select(
        *_PAYLOAD_COLS, F.xxhash64("url").alias("url_h"), F.lit(False).alias("is_seen")
    )
    if seen_exact is not None:
        zero = F.lit(0).cast("long")
        seen_side = seen_exact.select(
            F.col("url_id"), F.lit("").alias("url"), F.lit("").alias("host"),
            F.col("host_bucket"), F.lit(0.0).alias("priority"),
            zero.alias("co_seed_id"), F.lit(0).alias("co_page"),
            F.lit(0).alias("co_link_order"), F.lit(0).alias("co_depth"),
            F.lit("").alias("status"), zero.alias("lin_parent"),
            zero.alias("lin_seed"), F.lit(0).alias("lin_depth"),
            F.lit(0).alias("lin_epoch"),
            F.xxhash64("url").alias("url_h"), F.lit(True).alias("is_seen"),
        )
        cand_side = cand_side.unionByName(seen_side)
    state_src = (
        seen_state
        if seen_state is not None
        else spark.createDataFrame([], _STATE_SCHEMA)
    )

    # ONE cogroup: keep-first + probe + exact resolve + insert (+ rebuild)
    out = (
        cand_side.groupBy("host_bucket")
        .cogroup(state_src.groupBy("host_bucket"))
        .applyInPandas(_fused_fn(epoch, capacity), _OUT_SCHEMA)
        .persist()
    )
    updated_state = out.filter(F.col("bloom").isNotNull()).select(
        "host_bucket", "bloom", "cuckoo", "n_items", "epoch"
    )
    new_flat = out.filter(F.col("bloom").isNull()).select(*_PAYLOAD_COLS).withColumn(
        "lin_parent",
        F.when(F.col("lin_parent") == -1, F.lit(None).cast("long")).otherwise(
            F.col("lin_parent")
        ),
    )
    return _unflatten(new_flat), updated_state, [out]
