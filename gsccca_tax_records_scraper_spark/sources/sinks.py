"""Result sinks (SURVEY S5-S9, J2).

The reference appends one Excel row per record with a tmp+rename atomic save
(lien_index_scraper.py:158-208), bulk-dumps with column rename/reorder/pad
(:877-948), and upserts into SQLite on compound natural keys
(dashboard/utils/init_scraper.py:74-90,142-150). Table-format equivalents:

  append_records      append-only parquet (atomicity from the committer)
  upsert_records      idempotent dedup-write: batch-internal dropDuplicates
                      + left_anti vs existing on the natural key (the
                      MERGE-INTO shape without an Iceberg runtime)
  export_single_file  projection/rename/pad + coalesce(1) (the Excel dump)
  read_latest_export  latest-by-mtime re-ingest (find_excel.py:8-21)
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_records(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def hyperlink_formula_col(documents_dir: str, name):
    """The export sheet's View-PDF cell (F15): `=HYPERLINK("file:///<dir>/
    <name>", "<name>")`, empty cell when the name is blank — mirrors
    lien_index_scraper.py:184-189,924-928."""
    base = documents_dir.replace(os.sep, "/").rstrip("/")
    return F.when(
        F.trim(name) != "",
        F.concat(
            F.lit(f'=HYPERLINK("file:///{base}/'), name, F.lit('", "'), name, F.lit('")')
        ),
    ).otherwise(F.lit(""))


def upsert_records(
    spark: SparkSession, df: DataFrame, path: str, natural_key: list[str]
) -> int:
    """Insert rows whose natural key is not yet present; returns the insert
    count (the reference's saved_count accumulator,
    init_scraper.py:92-101). Existing rows win (update_or_create with
    no-op update semantics at the engine layer)."""
    batch = df.dropDuplicates(natural_key)
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*natural_key)
        # null-safe equality: a NULL key component must still match itself,
        # or NULL-keyed rows re-insert on every call and break idempotence
        cond = None
        for k in natural_key:
            c = batch[k].eqNullSafe(existing[k])
            cond = c if cond is None else cond & c
        batch = batch.join(existing, cond, "left_anti")
    batch = batch.cache()
    n = batch.count()
    if n:
        batch.write.mode("append").parquet(path)
    batch.unpersist()
    return n


def upsert_records_bucketed(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    natural_key: list[str],
    n_buckets: int = 64,
) -> int:
    """The MERGE-INTO shape of `upsert_records` for big tables: the store is
    hive-partitioned by `key_bucket = pmod(xxhash64(key), n_buckets)`, and an
    incoming batch prunes the existing-side scan to ONLY the partitions its
    own keys hash into (pushed partition filter). `upsert_records` re-reads
    the whole existing table per call — fine for small state, quadratic
    over a run at 10^10 rows; this variant's per-call read is proportional
    to the batch's bucket fan-out, which is what Iceberg/Delta MERGE does
    with partition-level pruning. Same null-safe keep-existing semantics;
    returns the insert count."""
    batch = df.dropDuplicates(natural_key).withColumn(
        "key_bucket", F.pmod(F.xxhash64(*natural_key), F.lit(n_buckets)).cast("int")
    )
    batch = batch.cache()
    try:
        if os.path.exists(path):
            touched = [int(r.key_bucket) for r in batch.select("key_bucket").distinct().collect()]
            existing = (
                spark.read.parquet(path)
                .filter(F.col("key_bucket").isin(touched))  # partition-pruned scan
                .select(*natural_key, "key_bucket")
            )
            cond = F.col("b.key_bucket") == F.col("e.key_bucket")
            for k in natural_key:
                cond = cond & F.col(f"b.{k}").eqNullSafe(F.col(f"e.{k}"))
            batch = batch.alias("b").join(existing.alias("e"), cond, "left_anti")
            batch = batch.cache()
        n = batch.count()
        if n:
            batch.write.mode("append").partitionBy("key_bucket").parquet(path)
        return n
    finally:
        batch.unpersist()


def export_single_file(
    df: DataFrame,
    path: str,
    column_mapping: list[tuple[str, str]] | None = None,
) -> None:
    """Bulk export: dict-driven select/rename with ""-padding for missing
    columns (lien_index_scraper.py:900-922), single output file."""
    if column_mapping:
        cols = []
        for src, header in column_mapping:
            c = F.coalesce(F.col(src), F.lit("")) if src in df.columns else F.lit("")
            cols.append(c.alias(header))
        df = df.select(*cols)
    df.coalesce(1).write.mode("overwrite").parquet(path)


def read_latest_export(spark: SparkSession, directory: str) -> DataFrame:
    """Latest-by-mtime ingest (find_latest_excel_file, find_excel.py:8-21)."""
    candidates = [
        p for p in Path(directory).iterdir()
        if p.is_dir() and (p / "_SUCCESS").exists()
    ]
    if not candidates:
        raise FileNotFoundError(f"no committed exports under {directory}")
    latest = max(candidates, key=lambda p: p.stat().st_mtime)
    return spark.read.parquet(str(latest))
