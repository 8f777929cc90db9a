"""Windowed metrics over event streams (SURVEY T7, W-family).

The reference has no session/tumbling windows; the engine provides tumbling
count/sum windows over fetch/metric events for monitoring — batch and
streaming variants of the same logical plan (Structured Streaming with a
watermark for late data)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_metrics(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch tumbling-window aggregation: (window_start, event_type, n, total)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def streaming_tumbling_metrics(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "metrics_stream",
    output_mode: str = "update",
):
    """Streaming variant over a parquet directory source with a watermark
    for late rows; memory sink for inspection. Returns the StreamingQuery.

    output_mode='update' (default) honors the watermark and evicts closed
    windows' state; 'complete' keeps all state forever (watermark ignored by
    Spark in that mode) and is only for small inspection runs.

    READ PATTERN: the memory sink APPENDS each trigger's output rows, and
    with maxFilesPerTrigger=4 a window typically updates across several
    triggers. In 'update' mode `SELECT * FROM <query_name>` therefore
    contains stale versions of re-emitted windows — readers must take the
    LAST row per (window_start, event_type) (e.g. qualify
    row_number() over (partition by window_start, event_type order by
    rowid desc) = 1, or re-aggregate with max). Only 'complete' mode's table
    is directly readable after processAllAvailable()."""
    events = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 4).parquet(parquet_dir)
    )
    # watermarks require TIMESTAMP (session-TZ), not TIMESTAMP_NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
