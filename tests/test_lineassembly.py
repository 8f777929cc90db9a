"""A5 word->line rollup and W2 bounded-lookback address assembly."""

from __future__ import annotations

from gsccca_tax_records_scraper_spark.operators import lineassembly, politeness
from pyspark.sql import functions as F


def _words(spark):
    # doc with three lines forming an address + a distant header line
    rows = [
        # (doc, block, par, line, word, left, top, width, height)
        ("d1", 0, 0, 0, "STATE", 0, 0, 50, 10),
        ("d1", 0, 0, 0, "HEADER", 60, 0, 50, 10),
        ("d1", 1, 0, 0, "JOHN", 0, 100, 40, 10),
        ("d1", 1, 0, 0, "SMITH", 50, 100, 40, 10),
        ("d1", 1, 0, 1, "123", 0, 112, 30, 10),
        ("d1", 1, 0, 1, "MAIN", 40, 112, 30, 10),
        ("d1", 1, 0, 1, "ST", 80, 112, 20, 10),
        ("d1", 1, 0, 2, "ATLANTA,", 0, 124, 60, 10),
        ("d1", 1, 0, 2, "GA", 70, 124, 20, 10),
        ("d1", 1, 0, 2, "30303", 100, 124, 40, 10),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, block int, par int, line int, word string,"
        " left int, top int, width int, height int",
    )


def test_words_to_lines_sorts_by_left_and_unions_bbox(spark):
    lines = lineassembly.words_to_lines(_words(spark))
    by_line = {(r.block, r.par, r.line): r for r in lines.collect()}
    assert by_line[(1, 0, 2)].text == "ATLANTA, GA 30303"
    assert by_line[(0, 0, 0)].text == "STATE HEADER"
    r = by_line[(1, 0, 1)]
    assert (r.left, r.top, r.right, r.bottom) == (0, 112, 100, 122)


def test_assemble_addresses_lookback_with_gap_stop(spark):
    lines = lineassembly.words_to_lines(_words(spark))
    out = lineassembly.assemble_addresses(lines, r"GA\s+\d{5}$").collect()
    assert len(out) == 1
    # lines at top=100/112/124 chain (gaps of 2 <= 2.5*10); the header at
    # top=0 is beyond the gap and beyond the 3-line lookback
    assert out[0].address == "JOHN SMITH 123 MAIN ST ATLANTA, GA 30303"


def test_assemble_addresses_gap_breaks_chain(spark):
    rows = [
        ("d2", 0, 0, 0, "FAR", 0, 0, 30, 10),
        ("d2", 0, 0, 1, "NEAR", 0, 200, 30, 10),
        ("d2", 0, 0, 2, "GA 30303", 0, 212, 80, 10),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, block int, par int, line int, word string,"
        " left int, top int, width int, height int",
    )
    lines = lineassembly.words_to_lines(df)
    out = lineassembly.assemble_addresses(lines, r"GA\s+\d{5}$").collect()
    # FAR is 190px above NEAR (> 2.5*10): chain stops after NEAR
    assert out[0].address == "NEAR GA 30303"


def test_jitter_is_deterministic_and_bounded(spark):
    df = spark.range(1000).select(
        politeness.jitter_ms_col(F.col("id")).alias("j")
    )
    a = [r.j for r in df.collect()]
    b = [r.j for r in df.repartition(7).orderBy("j").collect()]
    assert sorted(a) == b  # stable under repartitioning
    assert all(3000 <= j < 5000 for j in a)
    assert len(set(a)) > 100  # actually spread out
