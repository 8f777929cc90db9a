"""Conditional expensive-path execution (SURVEY §4 two-stage pipeline).

The reference runs the cheap tesseract pass on every page and the expensive
PaddleOCR/ROI recovery ONLY for pages whose cheap pass missed TOTAL or
DESCRIPTION (ocr/ocr_tax_extractor.py:286-297: `missing_total =
TOTAL_DECIMAL_RE.search(base_text) is None` gates the second engine).

Spark shape: cheap columns for everyone, `filter(missing)` -> expensive
columns for the residue only, union back. The expensive stage (a Pandas UDF
/ mapInPandas OCR call in real deployments) therefore sees only the miss
fraction — at a 95% cheap hit rate that is 20x less Python/GPU work than
running it unconditionally, and Catalyst pushes the miss predicate into the
expensive branch's scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def two_stage_extract(
    df: DataFrame,
    cheap: dict[str, Column],
    missing: Column,
    expensive: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Add `cheap` columns to every row; rows where `missing` holds are
    re-derived by `expensive(miss_rows)` (same output schema); hit rows pass
    through untouched. Row count is preserved: a NULL-valued `missing`
    predicate (e.g. a comparison on a NULL column) routes the row to the
    expensive branch (conservative — re-derive rather than silently drop;
    filter(~NULL) and filter(NULL) would otherwise both exclude it)."""
    missing = F.coalesce(missing, F.lit(True))
    base = df
    for name, col in cheap.items():
        base = base.withColumn(name, col)
    hits = base.filter(~missing)
    recovered = expensive(base.filter(missing))
    return hits.unionByName(recovered)
