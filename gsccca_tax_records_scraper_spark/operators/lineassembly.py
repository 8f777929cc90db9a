"""OCR line assembly + multi-line address lookback (SURVEY A5/W2).

Reference:
  - words -> lines: group OCR words by (block, par, line), sort by `left`
    within the group, concat text, union the bbox
    (ocr/ocr_tax_extractor.py:398-432)
  - address assembly: from a zip-bearing anchor line, walk up to 3
    *preceding* lines, stopping when the vertical gap exceeds 2.5x the line
    height (lien_index_scraper.py:767-795; ocr_tax_extractor.py:652-676)

Spark shapes: the word->line rollup is a pure groupBy/agg; the bounded
lookback is lag(text, k) over a per-doc window with a gap predicate — both
JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_FACTOR = 2.5  # stop when gap > 2.5 * line height (ocr_tax:652-676)
LOOKBACK = 3


def words_to_lines(words: DataFrame) -> DataFrame:
    """(doc_id, block, par, line, word, left, top, width, height) ->
    one row per line with concatenated text + union bbox."""
    return (
        words.groupBy("doc_id", "block", "par", "line")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("left", "word"))),
                    lambda s: s.getField("word"),
                ),
                " ",
            ).alias("text"),
            F.min("left").alias("left"),
            F.min("top").alias("top"),
            F.max(F.col("left") + F.col("width")).alias("right"),
            F.max(F.col("top") + F.col("height")).alias("bottom"),
        )
        .withColumn("line_h", F.col("bottom") - F.col("top"))
    )


def assemble_addresses(lines: DataFrame, anchor_pattern: str) -> DataFrame:
    """For each line matching `anchor_pattern` (e.g. a state-zip regex),
    prepend up to LOOKBACK preceding lines whose cumulative vertical gaps
    stay within GAP_FACTOR * line height (the reference's upward walk).
    Output: (doc_id, anchor_top, address)."""
    w = Window.partitionBy("doc_id").orderBy("top", "left")
    lag_text = [F.lag("text", k).over(w) for k in range(1, LOOKBACK + 1)]
    lag_top = [F.lag("top", k).over(w) for k in range(1, LOOKBACK + 1)]
    lag_bottom = [F.lag("bottom", k).over(w) for k in range(1, LOOKBACK + 1)]

    df = lines.select(
        "doc_id", "text", "top", "bottom", "line_h",
        *[t.alias(f"t{k}") for k, t in enumerate(lag_text, 1)],
        *[t.alias(f"top{k}") for k, t in enumerate(lag_top, 1)],
        *[t.alias(f"bot{k}") for k, t in enumerate(lag_bottom, 1)],
    ).filter(F.col("text").rlike(anchor_pattern))

    # gap between line k-1 and k (bottom of the earlier, top of the later);
    # the walk stops at the first oversized gap
    max_gap = F.col("line_h") * GAP_FACTOR
    ok1 = (F.col("top") - F.col("bot1")) <= max_gap
    ok2 = ok1 & ((F.col("top1") - F.col("bot2")) <= max_gap)
    ok3 = ok2 & ((F.col("top2") - F.col("bot3")) <= max_gap)

    parts = F.concat_ws(
        " ",
        F.when(ok3, F.col("t3")),
        F.when(ok2, F.col("t2")),
        F.when(ok1, F.col("t1")),
        F.col("text"),
    )
    return df.select(
        "doc_id", F.col("top").alias("anchor_top"), parts.alias("address")
    )
