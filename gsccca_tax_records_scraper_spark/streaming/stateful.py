"""Streaming URL-seen dedup: applyInPandasWithState (SURVEY §2.9 T2/T3).

The batch engine carries the blocked-Bloom + cuckoo seen set through epoch
checkpoint tables. This module is the same operator as a CUSTOM STATEFUL
STREAMING operator (north_star asks for Structured Streaming equivalents):
candidate URLs arrive on a stream, state is the per-host_bucket filter pair
kept in the streaming state store, and the output stream is the admitted
(first-ever-seen) URLs. Late/duplicate re-deliveries are absorbed exactly
like the batch path (T3): a URL already in the bucket's exact set is
dropped, a bloom false positive is resolved against the exact ids held in
state.

Differences vs the batch path, by design:
  - state carries the bucket's exact id array — the SAME design the batch
    path's seen_state row uses (operators/dedup.py carries packed sorted
    key arrays per bucket); ids are 8 bytes each — 2M urls/bucket is 16 MB,
    within state-store practice at the documented 4096-bucket layout.
  - output mode is append (admitted urls are immutable facts).

GroupStateTimeout: none — the seen set never expires (a crawl's visited set
is permanent for the run's lifetime).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators import seenset

# state: one row per host_bucket
_STATE_SCHEMA = "bloom binary, cuckoo binary, ids binary, n_items long"
_OUTPUT_SCHEMA = "host_bucket int, url_id long, url string"


def _dedup_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    max_ids: int,
) -> Iterator[pd.DataFrame]:
    """One host_bucket's micro-batch: probe -> exact resolve -> admit ->
    insert, all against the bucket's state-store row."""
    if state.exists:
        bloom_b, cuckoo_b, ids_b, _n = state.get
        bloom = seenset.BlockedBloom.from_bytes(bytes(bloom_b))
        cuckoo = seenset.CuckooFilter.from_bytes(bytes(cuckoo_b))
        seen_ids = np.frombuffer(bytes(ids_b), dtype=np.int64)
    else:
        bloom = seenset.BlockedBloom.for_capacity(seenset.DEFAULT_PARTITION_CAPACITY)
        cuckoo = seenset.CuckooFilter.for_capacity(seenset.DEFAULT_PARTITION_CAPACITY)
        seen_ids = np.zeros(0, dtype=np.int64)

    admitted = []
    for pdf in pdfs:
        if pdf.empty:
            continue
        # in-batch keep-first (urls may repeat within one micro-batch)
        pdf = pdf.drop_duplicates("url_id", keep="first")
        ids = pdf["url_id"].to_numpy(dtype="int64")
        maybe = bloom.contains(ids.view(np.uint64))
        new_mask = ~maybe
        if maybe.any() and len(seen_ids):
            # exact resolve: bloom positives not in the exact id set are fp
            fp = ~np.isin(ids[maybe], seen_ids)
            new_mask = new_mask.copy()
            new_mask[np.flatnonzero(maybe)[fp]] = True
        elif maybe.any():
            new_mask = np.ones(len(ids), dtype=bool)
        new = pdf[new_mask]
        if len(new):
            new_ids = np.sort(new["url_id"].to_numpy(dtype="int64"))
            bloom.insert(new_ids.view(np.uint64))
            cuckoo.insert(new_ids.view(np.uint64))
            seen_ids = np.concatenate([seen_ids, new_ids])
            admitted.append(new[["host_bucket", "url_id", "url"]])

    if len(seen_ids) > max_ids:
        # hard state-row capacity (r2 verdict #8): the streaming state store
        # must not grow one row without bound. Crossing the cap fails LOUDLY
        # with the remediation (more buckets = smaller rows) instead of
        # silently ballooning every micro-batch commit. NOTE (r3 ADVICE #2):
        # unlike the batch engine's split_seen_state, applyInPandasWithState
        # state is keyed by the OLD bucket ids — a plain restart with a
        # larger fan-out would find empty state under the new keys and
        # re-admit seen urls. The fan-out change needs a FRESH checkpoint
        # location plus a state rebuild: replay the seen urls (e.g. the
        # batch lineage table seen_exact, or this stream's own admitted
        # output) through the new-fan-out stream FIRST — reseed_frame()
        # builds that replay input — then attach the live candidate source.
        raise RuntimeError(
            f"streaming seen-set bucket {key[0]} holds {len(seen_ids)} ids, over"
            f" max_ids_per_bucket={max_ids}: re-shard to a larger host-bucket"
            " fan-out. This requires a FRESH streaming checkpoint + state"
            " rebuild (state is keyed by the old bucket ids): replay the"
            " seen urls through the new-fan-out stream first (see"
            " reseed_frame), THEN attach the live source. A plain restart"
            " with more buckets would re-admit already-seen urls."
        )
    state.update(
        (
            bloom.to_bytes(),
            cuckoo.to_bytes(),
            np.sort(seen_ids).tobytes(),
            int(len(seen_ids)),
        )
    )
    if admitted:
        yield pd.concat(admitted, ignore_index=True)


# default cap: 4M ids = 32 MB exact array per state row (plus ~2 MB filters)
# — at the documented 4096-bucket layout that bounds lifetime capacity at
# ~1.6*10^10 urls while keeping every state-row rewrite micro-batch-friendly
DEFAULT_MAX_IDS_PER_BUCKET = 4_000_000


def streaming_dedup(
    candidates: DataFrame, max_ids_per_bucket: int = DEFAULT_MAX_IDS_PER_BUCKET
) -> DataFrame:
    """candidates: a STREAMING DataFrame with (host_bucket int, url_id long,
    url string). Returns the admitted-urls stream (append mode): each url
    appears exactly once across the stream's lifetime, first delivery wins.
    Per-bucket state is hard-capped at `max_ids_per_bucket` exact ids (the
    documented sizing invariant: n_buckets * cap >= crawl lifetime urls);
    crossing it raises instead of growing without bound."""

    def fn(key, pdfs, state):
        return _dedup_group(key, pdfs, state, max_ids_per_bucket)

    return candidates.groupBy("host_bucket").applyInPandasWithState(
        fn,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def reseed_frame(seen_urls: DataFrame, n_buckets: int) -> DataFrame:
    """State-rebuild input for a fan-out change (see the over-cap error):
    relabel already-seen urls — the batch lineage table seen_exact, or this
    stream's own admitted output — to the NEW bucket fan-out. Write this
    frame to the new stream's source (e.g. its file/Kafka ingest dir) and
    let it drain BEFORE attaching live candidates: every url lands in its
    new bucket's state, so the rebuilt stream is exactly-once again.
    Replay order does not matter (first delivery wins and these are all
    firsts); duplicates across replay+live are absorbed like any late
    re-delivery (T3)."""
    from pyspark.sql import functions as F

    from ..functions.urltools import host_bucket_col

    return seen_urls.select(
        host_bucket_col(F.col("url_id"), n_buckets).alias("host_bucket"),
        "url_id",
        "url",
    )
