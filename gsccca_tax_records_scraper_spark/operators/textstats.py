"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, fingerprinting. All JVM-side column expressions (no UDFs);
each has an exact ANSI-SQL mirror in the driver oracle.

These generalize the reference's text handling (skip-word predicates
realestate_index_scraper.py:148-152; normalization chains
ocr/ocr_tax_extractor.py:125-129,680-708) to corpus-scale curation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword lists for the n-gram/stopword-ratio heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]
# BPE-ish token pattern: letter runs | digit runs | single punctuation
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
CJK_PATTERN = r"[一-鿿]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-like regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = F.split(F.lower(text), " ")
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def langid_col(text: Column) -> Column:
    """Heuristic language ID: CJK chars -> zh; stopword ratio >= 2% -> en;
    else unknown. (The synthetic corpus shares one vocabulary across its
    `lang` labels, so the contract is Spark == oracle on the heuristic, not
    recovery of the label.)"""
    has_cjk = F.regexp_count(text, F.lit(CJK_PATTERN)) > 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(stopword_ratio(text) >= 0.02, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def punct_ratio(text: Column) -> Column:
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def mean_word_len(text: Column) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality score: length band + low punctuation +
    stopword presence + word-length sanity. Deterministic, SQL-mirrorable."""
    n = F.length(text)
    len_ok = F.when((n >= 100) & (n <= 10000), 1.0).otherwise(0.25)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.5)
    sw_ok = F.when(stopword_ratio(text) >= 0.01, 1.0).otherwise(0.5)
    mwl = mean_word_len(text)
    wl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.5)
    return F.round((len_ok + punct_ok + sw_ok + wl_ok) / 4.0, 4)


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive md5 fingerprint of the distinct-token bag."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " "))
