"""Conditional expensive-path execution (SURVEY §4, ocr_tax_extractor.py:
286-297): the expensive stage must see ONLY the rows the cheap pass missed."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.operators.twostage import two_stage_extract


def test_expensive_stage_sees_only_misses(spark):
    rows = [(i, f"TOTAL DUE: ${i}.00" if i % 3 else "no totals here") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def expensive(miss):
        # a mapInPandas stand-in for the PaddleOCR ROI pass: crashes loudly
        # if a cheap-hit row ever reaches it
        def fn(it):
            for pdf in it:
                assert (pdf["total"] == "").all(), "expensive saw a cheap hit"
                out = pdf.copy()
                out["total"] = "999.99"
                out["source"] = "roi"
                yield out

        return miss.mapInPandas(fn, "doc_id long, text string, total string, source string")

    out = two_stage_extract(
        df,
        cheap={
            "total": F.regexp_extract("text", r"TOTAL DUE: \$([\d.]+)", 1),
            "source": F.lit("cheap"),
        },
        missing=F.col("total") == "",
        expensive=expensive,
    ).select("doc_id", "total", "source")
    got = out.collect()
    assert len(got) == 90  # row count preserved
    by_source = pd.Series([r.source for r in got]).value_counts().to_dict()
    assert by_source == {"cheap": 60, "roi": 30}
    assert all(r.total == "999.99" for r in got if r.source == "roi")
    assert all(r.total != "" for r in got)


def test_null_predicate_routes_to_expensive(spark):
    """A NULL-valued `missing` predicate must not drop rows: filter(~NULL)
    and filter(NULL) would both exclude them; the operator coalesces NULL to
    True (conservative: re-derive)."""
    df = spark.createDataFrame(
        [(1, "10"), (2, None), (3, "30")], "doc_id long, raw string"
    )
    out = two_stage_extract(
        df,
        cheap={"val": F.col("raw").cast("int")},
        missing=F.col("val") < 20,  # NULL for doc 2
        expensive=lambda miss: miss.withColumn("val", F.lit(-1)),
    )
    got = {r.doc_id: r.val for r in out.collect()}
    assert got == {1: -1, 2: -1, 3: 30}
