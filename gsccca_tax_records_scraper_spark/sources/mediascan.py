"""Media blob ingestion (SURVEY S10/S11).

Reference: recursive image-extension glob, sorted
(ocr/realestate_ocr_extractor.py:434-446) feeding the OCR batch CLI. Spark:
the binaryFile source — columnar listing, predicate pushdown on
path/modificationTime/length, content as a binary column — plus the
content-addressing step that turns blobs into `media_ref` strings (the
engine's span model stores refs, never bytes; SURVEY §1.1 "Media store").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_GLOB = "*.{png,jpg,jpeg,tif,tiff,bmp,pdf}"


def scan_media_dir(
    spark: SparkSession, path: str, glob: str = IMAGE_GLOB, max_bytes: int | None = None
) -> DataFrame:
    """Recursive binary-file scan -> (path, mod_time, n_bytes, media_ref,
    media_bytes). media_ref is the content hash (sha1, matching the
    reference's cache key idea at realestate_ocr_extractor.py:279-282)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df.select(
        F.col("path"),
        F.col("modificationTime").alias("mod_time"),
        F.col("length").alias("n_bytes"),
        F.concat(F.lit("sha1:"), F.sha1(F.col("content"))).alias("media_ref"),
        F.col("content").alias("media_bytes"),
    )
