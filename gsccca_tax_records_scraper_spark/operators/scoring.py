"""Money-candidate scoring + top-k (SURVEY A2/O3).

Reference: ocr/ocr_tax_extractor.py:436-555 — every money string in the OCR
text is scored by the keyword weights of its line (TOTAL DUE=12 ... TAX=2,
:451-462) plus a value/1000 bias (:482-489); candidates sort desc and the
top 3 survive (:546-551).

Spark shape: a scalar pandas UDF emits the per-doc candidate array
(vectorized Arrow batches; the regex pass itself is per-line either way),
then explode + window row_number over (score desc, raw) takes the top-k —
the A2 "scored top-k" primitive on any text column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import extract

_CAND_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("score", T.DoubleType(), False),
            T.StructField("raw", T.StringType(), False),
        ]
    )
)


@F.pandas_udf(_CAND_TYPE)
def _candidates_udf(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: [
            {"score": float(s), "raw": r}
            for s, r in extract.score_money_candidates(t or "")
        ]
    )


def scored_top_amounts(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(id, raw, score, rank) — top-k scored money candidates per document."""
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_candidates_udf(F.col(text_col))).alias("c"),
    ).select("doc_id", F.col("c.raw").alias("raw"), F.col("c.score").alias("score"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("raw"))
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _kw_score_col(upper):
    """Additive keyword score of an UPPER-cased line (ocr_tax_extractor.py:
    451-462,483-485): every table keyword contained in the line adds its
    weight (so a 'TOTAL DUE' line scores TOTAL DUE + TOTAL + DUE)."""
    s = F.lit(0.0)
    for kw, w in extract.SCORE_KEYWORDS:
        s = s + F.when(upper.contains(kw), F.lit(w)).otherwise(F.lit(0.0))
    return s


def money_scored_topk_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Pure-Column (no Python UDF) version of the A2 money scorer, including
    the reference's TOTAL-without-$ fallback (ocr_tax_extractor.py:436-555):

      primary   per line: OCR fixups (§->$, word-initial S<digit> -> $),
                every $-amount scored = keyword weights + value/1000
      fallback  docs with no $-candidate >= 100: the max bare decimal of each
                TOTAL line joins the pool with a +5.0 boost
      top-k     row_number per doc over (score desc, raw asc)

    Whole plan is JVM-side: split/explode + regexp + window. One shuffle for
    the has-big-dollar aggregate, one for the final per-doc window."""
    lines = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line0"),
        )
        .select("doc_id", "line_no", F.trim("line0").alias("line"))
        .filter(F.col("line") != "")
        .withColumn("upper", F.upper("line"))
    )
    norm = F.regexp_replace(
        F.regexp_replace(F.col("line"), "§", "\\$"), r"\bS\s*(\d)", "\\$$1"
    )
    prim = (
        lines.select(
            "doc_id", "upper",
            F.explode(F.regexp_extract_all(norm, F.lit(r"(\$\s*[\d,]+(?:\.\d{1,2})?)"), 1)).alias("m"),
        )
        .select("doc_id", "upper", F.regexp_replace("m", " ", "").alias("raw"))
        .withColumn("numeric", F.regexp_replace("raw", r"[$,]", "").cast("double"))
        .withColumn(
            "score",
            F.round(
                _kw_score_col(F.col("upper"))
                + F.coalesce(F.col("numeric") / 1000.0, F.lit(0.0)),
                3,
            ),
        )
    )
    # prim is consumed twice (has_big + pool); it's a cheap regex scan, so
    # recomputation beats leaking a persist into the caller's session
    has_big = prim.groupBy("doc_id").agg(
        F.max(F.when(F.col("numeric") >= 100.0, 1).otherwise(0)).alias("big")
    )
    fb_lines = lines.filter(F.col("upper").contains("TOTAL")).join(
        has_big.filter(F.col("big") == 1).select("doc_id"), "doc_id", "left_anti"
    )
    decs = fb_lines.select(
        "doc_id", "line_no", "upper",
        F.explode(
            F.regexp_extract_all(F.col("line"), F.lit(r"([\d,]+\.\d{2})"), 1)
        ).alias("d"),
    ).withColumn("v", F.regexp_replace("d", ",", "").cast("double"))
    fb = (
        decs.groupBy("doc_id", "line_no", "upper")
        .agg(F.max(F.struct(F.col("v"), F.col("d"))).alias("mx"))
        .select(
            "doc_id", "upper",
            F.col("mx.d").alias("raw"),
            F.col("mx.v").alias("numeric"),
        )
        .withColumn(
            "score",
            F.round(
                _kw_score_col(F.col("upper")) + F.lit(5.0) + F.col("numeric") / 1000.0,
                3,
            ),
        )
    )
    pool = prim.select("doc_id", "raw", "score").unionByName(
        fb.select("doc_id", "raw", "score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("raw"))
    return pool.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
