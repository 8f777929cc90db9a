"""Fuzzy address-list merge: the J4 theta/containment join (SURVEY J4).

Reference: ocr/addr.py:46-66 `merge_address_lists` — for each tesseract
address, find the first paddle address containing the same zipcode ("crude
similarity: zip match"), then token-level union merge (:11-43: keep the base
address, append the tokens of the other that the base doesn't contain).

Spark shape: zipcode is the equi key, containment is the theta residual ->
cogroup the two sides on (doc_id) and merge inside an applyInPandas body
(the per-pair logic is irregular: first-match + ordered token union).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

ZIP_RE = re.compile(r"\b(\d{5})(?:-\d{4})?\b")


def _zip_of(addr: str) -> str | None:
    m = ZIP_RE.search(addr)
    return m.group(1) if m else None


def merge_address_pair(base: str, other: str) -> str:
    """Token-union merge (ocr/addr.py:11-43): keep base, append tokens of
    `other` missing from base's token set, in `other`'s order."""
    base_tokens = base.split()
    seen = {t.upper().strip(",.") for t in base_tokens}
    extra = [
        t for t in other.split() if t.upper().strip(",.") not in seen
    ]
    return " ".join(base_tokens + extra) if extra else base


def merge_address_lists(primary: list[str], secondary: list[str]) -> list[str]:
    """For each primary address: first secondary address with the same
    zipcode merges in (first-match semantics, ocr/addr.py:54-58); unmatched
    primaries pass through; secondaries never create new rows."""
    out = []
    for a in primary:
        z = _zip_of(a)
        merged = a
        if z is not None:
            for b in secondary:
                if z and z in b:
                    merged = merge_address_pair(a, b)
                    break
        out.append(merged)
    return out


def merge_addresses(primary: DataFrame, secondary: DataFrame) -> DataFrame:
    """Cogrouped merge: both sides are (doc_id:string, ord:int, addr:string);
    output (doc_id, ord, merged). One shuffle on doc_id; the irregular
    first-match/union logic runs vectorized per group."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=["doc_id", "ord", "merged"])
        left = left.sort_values("ord")
        sec = right.sort_values("ord")["addr"].tolist() if not right.empty else []
        merged = merge_address_lists(left["addr"].tolist(), sec)
        return pd.DataFrame(
            {"doc_id": left["doc_id"].values, "ord": left["ord"].values, "merged": merged}
        )

    return (
        primary.groupBy("doc_id")
        .cogroup(secondary.groupBy("doc_id"))
        .applyInPandas(fn, "doc_id string, ord int, merged string")
    )
