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
