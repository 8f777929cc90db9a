"""Fuzzy address-list merge: the J4 theta/containment join (SURVEY J4).

Reference: ocr/addr.py:46-66 `merge_address_lists` — for each tesseract
address, find the first paddle address containing the same zipcode ("crude
similarity: zip match"), then token-level union merge (:11-43: the longer
address becomes the base, the other's missing tokens are appended).

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


def _normalize_for_compare(text: str) -> list[str]:
    """Uppercase + collapse commas/whitespace, for comparison only
    (ocr/addr.py:4-9)."""
    return re.sub(r"[,\s]+", " ", text.upper()).strip().split()


def merge_address_pair(addr1: str, addr2: str) -> str:
    """Token-union merge (ocr/addr.py:11-43): the LONGER (more detailed)
    address becomes the base; tokens of the other that the base's normalized
    token set lacks are appended in the other's order. Token normalization
    strips commas anywhere (periods kept), matching the reference."""
    tokens1 = _normalize_for_compare(addr1)
    tokens2 = _normalize_for_compare(addr2)
    if len(tokens2) > len(tokens1):
        base, other, base_tokens = addr2, addr1, tokens2
    else:
        base, other, base_tokens = addr1, addr2, tokens1
    merged = base.split()
    base_set = set(base_tokens)
    for token in other.split():
        if re.sub(r"[,\s]+", "", token).upper() not in base_set:
            merged.append(token)
    return " ".join(merged)


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
