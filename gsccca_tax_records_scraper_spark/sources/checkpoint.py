"""Epoch-versioned checkpoint store (SURVEY T2/T5, §1.1 "Resume state").

The reference persists resume state as a JSON file + a per-row CSV rewrite
(lien_index_scraper.py:114-128,592-593) — a full frontier rewrite after EVERY
processed row. Here state is a set of epoch-partitioned parquet tables under
a workdir (Iceberg-style layout; plain parquet in the sandbox, the paths and
commit protocol are format-agnostic):

    <workdir>/<table>/epoch=K/*.parquet     snapshot or delta per epoch
    <workdir>/MANIFEST-<v>.json             list of COMMITTED epochs, versioned

Commit protocol: all tables for epoch K are written first; the manifest is
committed last by writing a FRESH monotonically-versioned file
(tmp + rename to a name that never existed — atomic on POSIX, HDFS and any
rename-capable store, with no delete-then-rename window in which NO
manifest exists). Readers pick the highest READABLE version (a torn or
corrupt higher version falls back to the previous one); superseded
versions are pruned best-effort after the new one lands, keeping one
predecessor. A killed job therefore always resumes from the last committed
epoch; partially-written epoch K+1 dirs are ignored and overwritten. A
legacy single-file MANIFEST.json (pre-versioning layout) is still read
when no versioned manifest exists. Snapshot tables (frontier/host_state)
are read at exactly one epoch; delta tables (seen_exact/seen_state/
records/documents/metrics/revoked) are read as the union of epochs <= K
(seen_state additionally keeps only the latest row per bucket — see
DELTA_TABLES note).

Filesystem abstraction: plain paths use the local POSIX fast path; URI
workdirs (hdfs://, s3a://, file://, ...) route the manifest/_SUCCESS/rename
operations through the Hadoop FileSystem API reached over the session's JVM
gateway (`spark._jvm`) — the same FileSystem the parquet reads/writes
already use, so a 100-TB deployment points the store at its object store
with no code change. Note on S3: rename is copy+delete there, so the
manifest swap is last-writer-wins rather than atomic — single-writer (one
driver per workdir) is the store's documented contract on object stores.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

SNAPSHOT_TABLES = ("frontier", "host_state")
# seen_state is a ROW-SUPERSEDING delta table: each epoch writes only the
# bucket rows it changed; readers keep the latest row per bucket and the
# periodic compaction folds superseded rows away
DELTA_TABLES = ("seen_exact", "seen_state", "records", "documents", "metrics",
                "revoked")

_MANIFEST_RE = re.compile(r"^MANIFEST-(\d+)\.json$")


class _PosixFS:
    """Local-path operations (the fast path: no JVM round-trips)."""

    def mkdirs(self, path: str) -> None:
        Path(path).mkdir(parents=True, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        return Path(path).read_text()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = Path(path + ".tmp")
        tmp.write_text(text)
        os.replace(tmp, path)

    def listdir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def delete_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


class _HadoopFS:
    """The same operations through org.apache.hadoop.fs.FileSystem — resolved
    from the workdir URI's scheme via the session's Hadoop configuration, so
    whatever connectors the cluster ships (hdfs, s3a, abfs, file) work."""

    def __init__(self, spark: SparkSession, uri: str):
        jvm = spark._jvm
        self._jpath = jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(uri).getFileSystem(spark._jsc.hadoopConfiguration())
        self._jvm = jvm

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._jpath(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._jpath(path)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._jpath(path))
        try:
            # readAllBytes avoids a per-byte py4j crawl; manifests are tiny
            data = bytes(stream.readAllBytes())
        finally:
            stream.close()
        return data.decode("utf-8")

    def write_text_atomic(self, path: str, text: str) -> None:
        # the versioned-manifest protocol only ever renames onto FRESH
        # names, so this is a plain create+rename — atomic on HDFS — with
        # no delete-then-rename window (r3 ADVICE: delete+rename left a
        # crash window with no manifest at all)
        tmp = self._jpath(path + ".tmp")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = self._jpath(path)
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        if not self._fs.rename(tmp, dst):
            raise IOError(f"rename {path}.tmp -> {path} failed")

    def listdir(self, path: str) -> list[str]:
        p = self._jpath(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def delete(self, path: str) -> None:
        self._fs.delete(self._jpath(path), False)

    def delete_dir(self, path: str) -> None:
        self._fs.delete(self._jpath(path), True)


class CheckpointStore:
    def __init__(self, workdir: str | Path, spark: SparkSession | None = None):
        self._is_uri = "://" in str(workdir)
        if self._is_uri:
            if spark is None:
                raise ValueError(
                    f"URI workdir {workdir!r} needs a SparkSession to reach the"
                    " Hadoop FileSystem API: CheckpointStore(workdir, spark)"
                )
            self.workdir = str(workdir).rstrip("/")
            self.fs: _PosixFS | _HadoopFS = _HadoopFS(spark, self.workdir)
        else:
            # keep a Path here: local callers (and tests) join with `/`
            self.workdir = Path(workdir)
            self.fs = _PosixFS()
        self.fs.mkdirs(str(self.workdir))

    def manifest_path(self, version: int) -> str:
        return f"{self.workdir}/MANIFEST-{version}.json"

    @property
    def legacy_manifest_path(self) -> str:
        return f"{self.workdir}/MANIFEST.json"

    def _manifest_versions(self) -> list[int]:
        """Committed manifest versions, newest first."""
        out = []
        for name in self.fs.listdir(str(self.workdir)):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out, reverse=True)

    def _read_manifest_file(self, path: str) -> dict | None:
        """Parse one manifest file; None when unreadable/torn (the ONE
        shared read path, so every caller sees identical fallback and
        default-key semantics)."""
        try:
            m = json.loads(self.fs.read_text(path))
        except (ValueError, OSError):
            return None
        m.setdefault("compacted", {})
        m.setdefault("meta", {})
        return m

    def _manifest(self) -> dict:
        """Highest READABLE versioned manifest; a torn/corrupt higher
        version (crash mid-create on a store without atomic rename) falls
        back to its predecessor, so no crash window leaves the store
        without a manifest. Legacy single-file MANIFEST.json is read only
        when no versioned manifest exists (pre-versioning workdirs)."""
        for v in self._manifest_versions():
            m = self._read_manifest_file(self.manifest_path(v))
            if m is not None:
                return m
        if self.fs.exists(self.legacy_manifest_path):
            m = self._read_manifest_file(self.legacy_manifest_path)
            if m is not None:
                return m
        return {"epochs": [], "compacted": {}, "meta": {}}

    def manifests(self) -> list[dict]:
        """Every READABLE retained manifest, newest first: the current
        version plus the predecessor commit() keeps for torn-write
        fallback (legacy single-file when no versioned manifest exists).
        Segment GC unions referenced files over ALL of these so a reader
        that falls back to the predecessor never dangles on a reclaimed
        payload file."""
        out = []
        for v in self._manifest_versions():
            m = self._read_manifest_file(self.manifest_path(v))
            if m is not None:
                out.append(m)
        if not out and self.fs.exists(self.legacy_manifest_path):
            m = self._read_manifest_file(self.legacy_manifest_path)
            if m is not None:
                out.append(m)
        return out

    def committed_epochs(self) -> list[int]:
        return sorted(self._manifest()["epochs"])

    def last_epoch(self) -> int | None:
        epochs = self.committed_epochs()
        return epochs[-1] if epochs else None

    def meta(self, key: str, default=None):
        """Small committed key/value state riding in the manifest (e.g. the
        current host-bucket fan-out) — visible only after commit()."""
        return self._manifest()["meta"].get(key, default)

    def set_meta(self, key: str, value) -> None:
        self._pending_meta = getattr(self, "_pending_meta", {})
        self._pending_meta[key] = value

    def table_path(self, table: str, epoch: int) -> str:
        return f"{self.workdir}/{table}/epoch={epoch}"

    def clean_epoch(self, epoch: int) -> None:
        """Remove every table dir a CRASHED attempt may have left at
        `epoch`. Ops write different table subsets at the same epoch number
        (step: records/documents; revoke: revoked; fold/reseed: neither), so
        a crashed step retried as e.g. a revocation would otherwise leave
        the aborted fetch's records/documents dirs in place — and
        read_deltas, which trusts any existing dir at a committed epoch,
        would surface those phantom rows the moment the replacement op
        commits the epoch. Called at the START of every epoch-writing op,
        before its first write; parquet 'overwrite' mode only protects the
        tables the op itself writes."""
        for table in SNAPSHOT_TABLES + DELTA_TABLES:
            p = self.table_path(table, epoch)
            if self.fs.exists(p):
                self.fs.delete_dir(p)

    def write(self, table: str, epoch: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.table_path(table, epoch))

    def read_snapshot(self, spark: SparkSession, table: str, epoch: int) -> DataFrame:
        return spark.read.parquet(self.table_path(table, epoch))

    def compacted_path(self, table: str, epoch: int) -> str:
        return f"{self.workdir}/{table}/compacted={epoch}"

    def compacted_epoch(self, table: str) -> int | None:
        return self._manifest()["compacted"].get(table)

    def read_deltas(
        self,
        spark: SparkSession,
        table: str,
        upto_epoch: int,
        manifest: dict | None = None,
    ) -> DataFrame | None:
        """Union of the table's delta dirs up to `upto_epoch`, reading the
        latest committed compaction instead of the deltas it folded in.
        `manifest` pins the view to a specific retained manifest (see
        manifests()); default is the current one."""
        comp = (
            manifest["compacted"].get(table)
            if manifest is not None
            else self.compacted_epoch(table)
        )
        paths = []
        start = 0
        if comp is not None and comp <= upto_epoch:
            paths.append(self.compacted_path(table, comp))
            start = comp + 1
        paths += [
            self.table_path(table, e)
            for e in range(start, upto_epoch + 1)
            if self.fs.exists(self.table_path(table, e) + "/_SUCCESS")
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def compact_deltas(
        self, spark: SparkSession, table: str, upto_epoch: int, transform=None
    ) -> None:
        """Fold all deltas <= upto_epoch into one partitioned dir. Readers
        switch over only at the next manifest commit (the compacted epoch is
        recorded there), so a crash mid-compaction leaves an ignored orphan
        dir. Old delta dirs are retained (cheap, crash-safe; a vacuum step
        can remove them once the compaction is committed). `transform`
        (DataFrame -> DataFrame) folds row-superseding tables — e.g.
        seen_state keeps only the latest row per bucket."""
        df = self.read_deltas(spark, table, upto_epoch)
        if df is None:
            return
        if transform is not None:
            df = transform(df)
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
        meta = m["meta"]
        meta.update(getattr(self, "_pending_meta", {}))
        self._pending_meta = {}
        versions = self._manifest_versions()
        v_new = (versions[0] if versions else 0) + 1
        # commit = create the NEXT version under a fresh name (no moment
        # without a readable manifest), then prune superseded versions
        # best-effort, keeping one predecessor for torn-write fallback
        self.fs.write_text_atomic(
            self.manifest_path(v_new),
            json.dumps(
                {"epochs": sorted(epochs), "compacted": m["compacted"], "meta": meta}
            ),
        )
        for v in versions:
            if v <= v_new - 2:
                self.fs.delete(self.manifest_path(v))
        # a versioned manifest supersedes the legacy single file entirely
        if self.fs.exists(self.legacy_manifest_path):
            self.fs.delete(self.legacy_manifest_path)
