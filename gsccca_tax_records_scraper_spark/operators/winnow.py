"""Winnowing document fingerprints over a polynomial ROLLING hash
(Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — the MOSS algorithm): hash every k-gram of
the text, slide a window of w consecutive k-gram hashes, keep the minimal
hash per window (rightmost on ties), dedupe positions. The selected set
is position-robust — a local edit perturbs only the fingerprints whose
k-gram or window covers it — which is what makes it the standard
copy-detection / near-dup fingerprint, complementing the bag-of-tokens
`textstats.doc_fingerprint` (order-insensitive, whole-doc).

The rolling hash is the classic polynomial code: h(c_i..c_{i+k-1}) =
sum c_{i+j} * B^{k-1-j} mod M with B=131, M=2^31-1. Rather than rolling
sequentially (a per-character Python loop), every k-gram hash is computed
at once as a stride-view x kernel product: codepoints < 2^21 and kernel
values < 2^31 keep each product under 2^52 and a k-term sum under
int64, so the whole doc hashes in one vectorized numpy expression with
EXACT modular arithmetic — same values the sequential roll produces, at
SIMD speed. Guarantee (tested as a property): every window of w
consecutive k-grams contributes at least one selected fingerprint.

Scale shape: mapInPandas over Arrow batches, per-doc work linear in text
length, output rows = selected fingerprints only (density ~2/(w+1) of
positions). Joining docs on fp gives copy-detection candidate pairs with
the same bucketed-join shape as the minhash/simhash ladder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scanspread import spread_scan
from .textdedup import df_window_pairs

MOD = (1 << 31) - 1
BASE = 131
# codepoints <= 0x10FFFF < 2^21 and kernel values < 2^31 keep each product
# under 2^52; sums of up to MAX_K terms stay under 2^62 — int64-exact
MAX_K = 1024

FP_SCHEMA = "doc_id long, pos int, fp long"


def _check_kw(k: int, w: int) -> None:
    """A raise, not an assert: the overflow envelope must survive
    PYTHONOPTIMIZE-stripped workers — beyond MAX_K the int64 sums wrap
    SILENTLY into wrong-but-plausible fingerprints."""
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k={k} outside the int64-exact envelope [1, {MAX_K}]")
    if w < 1:
        raise ValueError(f"w={w} must be >= 1")


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """Exact polynomial hashes of every k-gram, vectorized (int64-exact for
    k <= MAX_K, asserted by the callers). surrogatepass keeps parity with
    ord() on lone surrogates (texts decoded upstream with surrogateescape
    must fingerprint, not kill the task). The (chunk, k) product
    temporaries are byte-bounded (~32 MB) so one long document cannot
    blow a worker's memory."""
    codes = np.frombuffer(
        text.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    ).astype(np.int64)
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    kernel = np.empty(k, dtype=np.int64)
    p = 1
    for j in range(k - 1, -1, -1):
        kernel[j] = p
        p = (p * BASE) % MOD
    view = np.lib.stride_tricks.sliding_window_view(codes, k)
    out = np.empty(n, dtype=np.int64)
    chunk = max(1, (32 << 20) // (k * 8))
    for lo in range(0, n, chunk):
        out[lo : lo + chunk] = (view[lo : lo + chunk] * kernel).sum(axis=1) % MOD
    return out


def winnow_one(text: str, k: int = 8, w: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """(positions, fingerprints) selected for one document. Fewer than w
    k-grams -> the single global minimum (short docs still fingerprint)."""
    _check_kw(k, w)
    h = _kgram_hashes(text, k)
    n = len(h)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if n < w:
        pos = np.array([n - 1 - h[::-1].argmin()], dtype=np.int64)
        return pos, h[pos]
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimal hash per window: argmin over the reversed window
    pos = np.arange(n - w + 1) + (w - 1 - wins[:, ::-1].argmin(axis=1))
    sel = np.unique(pos)
    return sel, h[sel]


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per selected fingerprint: (doc_id, pos, fp). pos is the
    k-gram's character offset, so matches can be located, not just
    counted. Equi-joining on fp yields copy-detection candidate pairs —
    the same bounded bucketed-join shape as the dedup ladder's other
    pair generators."""
    _check_kw(k, w)

    def run(it):
        for pdf in it:
            if pdf.empty:
                continue
            parts = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                pos, fps = winnow_one(text or "", k, w)
                if len(pos) == 0:
                    continue
                parts.append(pd.DataFrame({
                    "doc_id": np.full(len(pos), int(doc_id), dtype=np.int64),
                    "pos": pos.astype(np.int32),
                    "fp": fps,
                }))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return spread_scan(
        docs.select(F.col(id_col).cast("long").alias(id_col), text_col)
    ).mapInPandas(run, FP_SCHEMA)


def winnow_overlap_pairs(
    docs: DataFrame,
    min_common: int = 2,
    k: int = 8,
    w: int = 16,
    max_df: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Copy-detection candidate pairs sharing >= min_common distinct
    winnowing fingerprints, via the dedup ladder's shared bounded tail
    (textdedup.df_window_pairs): df-window pruning caps join fan-out at
    max_df^2 per fingerprint and — like the ngram high cut — is semantic:
    boilerplate fingerprints held by > max_df docs count toward no pair's
    n_common. Returns (doc_a, doc_b, n_common) with doc_a < doc_b."""
    fps = winnow_fingerprints(docs, k, w, id_col, text_col).select(
        "doc_id", "fp"
    ).distinct()
    return df_window_pairs(fps, "fp", min_common, max_df)
