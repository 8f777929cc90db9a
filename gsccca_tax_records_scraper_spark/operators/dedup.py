"""Frontier URL dedup: J1 as a bloom-prefiltered exact anti-join (SURVEY J1/T2).

Reference semantics: keep the FIRST occurrence of each URL, in discovery
order (ordered-dict dedup realestate_index_scraper.py:474; drop_duplicates
:510). Scale design (north_star):

  stage 1  in-batch keep-first      min_by(crawl order) per url_id — shuffle
           on url_id (balanced: url_id is a hash, no host skew)
  stage 2  bloom probe              cogrouped applyInPandas per host_bucket
           against the seen_state filter partitions: bloom-negative rows are
           DEFINITELY new (no join); positives are "maybe"
  stage 3  exact resolve            maybe-rows left_anti join seen_exact on
           (host_bucket, url_id, url) — at 10^10 scale this join only sees
           the ~fpr fraction of candidates, and partition-prunes on
           host_bucket
  stage 4  state update             cogrouped applyInPandas inserts confirmed
           new ids into bloom+cuckoo; only touched host_buckets rewrite

The decision is EXACT (filters only skip work, never claim "seen").
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


def order_cols() -> list:
    """The total grant/dedup order (matches simulator.order_key)."""
    return [F.col(c) for c in _ORDER_COLS]


def keep_first_in_batch(candidates: DataFrame) -> DataFrame:
    """Stage 1: one row per url_id, the first by crawl order."""
    w = Window.partitionBy("url_id").orderBy(*order_cols())
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _probe_fn():
    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({"url_id": pd.Series([], dtype="int64"),
                                 "bloom_maybe": pd.Series([], dtype="bool")})
        if right.empty:
            maybe = pd.Series(False, index=left.index)
        else:
            bloom = seenset.BlockedBloom.from_bytes(bytes(right["bloom"].iloc[0]))
            maybe = pd.Series(
                bloom.contains(left["url_id"].to_numpy(dtype="uint64")), index=left.index
            )
        return pd.DataFrame({"url_id": left["url_id"], "bloom_maybe": maybe})

    return probe


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
    """Returns (new_rows, updated_state_rows_for_touched_buckets).

    `candidates` is FRONTIER-shaped. `seen_exact` has (host_bucket, url_id,
    url); `seen_state` is SEEN_STATE-shaped (may be None on first epoch).
    """
    spark = candidates.sparkSession
    first = keep_first_in_batch(candidates)

    if seen_state is not None and seen_exact is not None:
        probes = (
            first.select("host_bucket", "url_id")
            .groupBy("host_bucket")
            .cogroup(seen_state.groupBy("host_bucket"))
            .applyInPandas(_probe_fn(), "url_id long, bloom_maybe boolean")
        )
        flagged = first.join(probes, "url_id", "inner")
        definite_new = flagged.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
        maybe = flagged.filter(F.col("bloom_maybe")).drop("bloom_maybe")
        recovered = maybe.join(
            seen_exact.select("host_bucket", "url_id", "url"),
            ["host_bucket", "url_id", "url"],
            "left_anti",
        )
        new_rows = definite_new.unionByName(recovered)
    else:
        new_rows = first

    state_src = (
        seen_state
        if seen_state is not None
        else spark.createDataFrame([], "host_bucket int, bloom binary, cuckoo binary, n_items long, epoch int")
    )
    updated_state = (
        new_rows.select("host_bucket", "url_id")
        .groupBy("host_bucket")
        .cogroup(state_src.groupBy("host_bucket"))
        .applyInPandas(
            _insert_fn(epoch),
            "host_bucket int, bloom binary, cuckoo binary, n_items long, epoch int",
        )
        .filter(F.col("host_bucket").isNotNull())
    )
    return new_rows, updated_state
