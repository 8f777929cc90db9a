"""Epoch-versioned checkpoint store (SURVEY T2/T5, §1.1 "Resume state").

The reference persists resume state as a JSON file + a per-row CSV rewrite
(lien_index_scraper.py:114-128,592-593) — a full frontier rewrite after EVERY
processed row. Here state is a set of epoch-partitioned parquet tables under
a workdir (Iceberg-style layout; plain parquet in the sandbox, the paths and
commit protocol are format-agnostic):

    <workdir>/<table>/epoch=K/*.parquet     snapshot or delta per epoch
    <workdir>/MANIFEST.json                 list of COMMITTED epochs

Commit protocol: all tables for epoch K are written first; the manifest is
rewritten last via tmp+rename (atomic on POSIX — same trick the reference
uses for Excel saves, lien_index_scraper.py:204-207). A killed job resumes
from the last committed epoch; partially-written epoch K+1 dirs are ignored
and overwritten. Snapshot tables (frontier/seen_state/host_state) are read at
exactly one epoch; delta tables (seen_exact/records/documents/metrics) are
read as the union of epochs <= K.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

SNAPSHOT_TABLES = ("frontier", "seen_state", "host_state")
DELTA_TABLES = ("seen_exact", "records", "documents", "metrics")


class CheckpointStore:
    def __init__(self, workdir: str | Path):
        if "://" in str(workdir):
            # the store currently manipulates the manifest and _SUCCESS
            # probes through the local filesystem; pointing it at hdfs://
            # or s3:// would silently read empty state — fail loudly instead.
            # (cluster deployments need these ops ported to the Hadoop
            # FileSystem API; the parquet reads/writes themselves are
            # already URI-agnostic.)
            raise NotImplementedError(
                "CheckpointStore supports local/shared-POSIX paths only; "
                f"got {workdir!r}"
            )
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)

    @property
    def manifest_path(self) -> Path:
        return self.workdir / "MANIFEST.json"

    def _manifest(self) -> dict:
        if not self.manifest_path.exists():
            return {"epochs": [], "compacted": {}}
        m = json.loads(self.manifest_path.read_text())
        m.setdefault("compacted", {})
        return m

    def committed_epochs(self) -> list[int]:
        return sorted(self._manifest()["epochs"])

    def last_epoch(self) -> int | None:
        epochs = self.committed_epochs()
        return epochs[-1] if epochs else None

    def table_path(self, table: str, epoch: int) -> str:
        return str(self.workdir / table / f"epoch={epoch}")

    def write(self, table: str, epoch: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.table_path(table, epoch))

    def read_snapshot(self, spark: SparkSession, table: str, epoch: int) -> DataFrame:
        return spark.read.parquet(self.table_path(table, epoch))

    def compacted_path(self, table: str, epoch: int) -> str:
        return str(self.workdir / table / f"compacted={epoch}")

    def compacted_epoch(self, table: str) -> int | None:
        return self._manifest()["compacted"].get(table)

    def read_deltas(self, spark: SparkSession, table: str, upto_epoch: int) -> DataFrame | None:
        """Union of the table's delta dirs up to `upto_epoch`, reading the
        latest committed compaction instead of the deltas it folded in."""
        comp = self.compacted_epoch(table)
        paths = []
        start = 0
        if comp is not None and comp <= upto_epoch:
            paths.append(self.compacted_path(table, comp))
            start = comp + 1
        paths += [
            self.table_path(table, e)
            for e in range(start, upto_epoch + 1)
            if os.path.exists(self.table_path(table, e) + "/_SUCCESS")
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def compact_deltas(self, spark: SparkSession, table: str, upto_epoch: int) -> None:
        """Fold all deltas <= upto_epoch into one partitioned dir. Readers
        switch over only at the next manifest commit (the compacted epoch is
        recorded there), so a crash mid-compaction leaves an ignored orphan
        dir. Old delta dirs are retained (cheap, crash-safe; a vacuum step
        can remove them once the compaction is committed)."""
        df = self.read_deltas(spark, table, upto_epoch)
        if df is None:
            return
        df.write.mode("overwrite").parquet(self.compacted_path(table, upto_epoch))
        self._pending_compactions = getattr(self, "_pending_compactions", {})
        self._pending_compactions[table] = upto_epoch

    def commit(self, epoch: int) -> None:
        m = self._manifest()
        epochs = set(m["epochs"])
        epochs.add(epoch)
        for table, e in getattr(self, "_pending_compactions", {}).items():
            m["compacted"][table] = e
        self._pending_compactions = {}
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"epochs": sorted(epochs), "compacted": m["compacted"]}))
        os.replace(tmp, self.manifest_path)
