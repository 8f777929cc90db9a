"""Segment-store backend (operators/segstore.py): write-once payload files,
worker-process cache, store-vs-inline bit-parity, engine GC, crash orphans.

The engine-level store coverage rides the default backend ("store") in
test_crawl_e2e/test_resume/test_compaction/test_split/test_revoke/
test_checkpoint_uri (file:// URI root through pyarrow.fs included); this
file covers the store's own contract.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from gsccca_tax_records_scraper_spark.operators import dedup, segstore
from gsccca_tax_records_scraper_spark.plans.epoch import CrawlEngine

import bench


def _mk_arrays(n, seed):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, 1 << 60, size=n).astype(np.int64))
    hs = rng.integers(-(1 << 62), 1 << 62, size=n).astype(np.int64)
    return ids, hs


def test_roundtrip_idempotent_and_cached(tmp_path):
    root = str(tmp_path / "segs")
    ids, hs = _mk_arrays(1000, 1)
    bloom_b, cuckoo_b = dedup._build_run(ids, hs)
    segstore.clear_cache()
    name = segstore.write_segment(root, 7, 3, bloom_b, cuckoo_b, ids, hs)
    assert name.startswith("b00007-s000003-") and name.endswith(".seg")
    # rewrite converges on the same name and leaves one file (retry/replay
    # idempotency: content-addressed write-once)
    assert segstore.write_segment(root, 7, 3, bloom_b, cuckoo_b, ids, hs) == name
    assert os.listdir(root) == [name]
    b2, c2, i2, h2 = segstore.read_segment(root, name)
    assert b2 == bloom_b and c2 == cuckoo_b
    assert (i2 == ids).all() and (h2 == hs).all()
    st = segstore.cache_stats()
    # write-through populated the cache: the read above was a hit
    assert st["hits"] >= 1 and st["entries"] >= 1
    # a cold process (cleared cache) reads the same bytes from disk
    segstore.clear_cache()
    b3, _c3, i3, _h3 = segstore.read_segment(root, name)
    assert b3 == bloom_b and (i3 == ids).all()
    # the cache is PART-granular (filters / keys load independently so
    # probes can skip key bytes): a cold whole read = two misses
    assert segstore.cache_stats()["misses"] == 2


def test_lru_byte_budget_evicts(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SEG_CACHE_MB", "1")  # 1 MiB budget
    root = str(tmp_path / "segs")
    segstore.clear_cache()
    names = []
    for b in range(12):  # ~200 KB payload each -> ~2.4 MB total
        ids, hs = _mk_arrays(12_000, b)
        bloom_b, cuckoo_b = dedup._build_run(ids, hs)
        names.append(segstore.write_segment(root, b, 0, bloom_b, cuckoo_b, ids, hs))
    st = segstore.cache_stats()
    assert st["bytes"] <= 1 << 20
    assert st["entries"] < 12  # oldest evicted
    # evicted entries still readable (from disk), newest still cached
    for name in names:
        segstore.read_segment(root, name)
    segstore.clear_cache()


def test_store_matches_inline_bitwise(spark, tmp_path):
    """The store backend must be a pure transport change: same admitted
    set, same metadata rows, bit-identical payload bytes per live segment
    across a two-epoch sequence."""
    root = str(tmp_path / "segs")
    c0 = bench._synth_candidates(spark, 6000, start=0, n_buckets=16)
    c1 = bench._synth_candidates(spark, 6000, start=3000, n_buckets=16)

    n0i, s0i, h0i = dedup.dedup_candidates(c0, None, 0)
    n0s, s0s, h0s = dedup.dedup_candidates(c0, None, 0, store_root=root)
    s0i, s0s = s0i.localCheckpoint(), s0s.localCheckpoint()
    for h in h0i + h0s:
        h.unpersist()
    n1i, s1i, h1i = dedup.dedup_candidates(c1, s0i, 1)
    n1s, s1s, h1s = dedup.dedup_candidates(c1, s0s, 1, store_root=root)
    assert sorted(r[0] for r in n1i.select("url_id").collect()) == sorted(
        r[0] for r in n1s.select("url_id").collect()
    )
    meta_i = sorted(
        tuple(r) for r in s1i.select("host_bucket", "seg", "lo", "n_items", "epoch").collect()
    )
    meta_s = sorted(
        tuple(r) for r in s1s.select("host_bucket", "seg", "lo", "n_items", "epoch").collect()
    )
    assert meta_i == meta_s
    for bucket in (0, 5, 11):
        pdf_i = s1i.filter(F.col("host_bucket") == bucket).toPandas()
        pdf_s = s1s.filter(F.col("host_bucket") == bucket).toPandas()
        segs_i = dedup._live_segments(pdf_i)
        segs_s = dedup._live_segments(pdf_s, root)
        assert len(segs_i) == len(segs_s) > 0
        for si, ss in zip(segs_i, segs_s):
            assert si["bloom_b"] == ss["bloom_b"]
            assert si["cuckoo_b"] == ss["cuckoo_b"]
            assert si["n"] == ss["n"]
            ss_ids, ss_hs = dedup.seg_keys(ss)  # store keys load lazily
            assert (si["ids"] == ss_ids).all()
            assert (si["hs"] == ss_hs).all()
    for h in h1i + h1s:
        h.unpersist()


def test_engine_records_backend_and_resume_adopts(spark, tmp_path):
    wd = tmp_path / "crawl"
    eng = CrawlEngine(spark, wd, epoch_seconds=60.0)
    assert eng.state_backend == "store"
    eng.run(seed_ids=[1, 2], max_epochs=2)
    # segment files exist and metadata references resolve
    seg_dir = wd / "segments"
    files = {f for f in os.listdir(seg_dir) if f.endswith(".seg")}
    assert files
    state = eng._read_seen_state(eng.store.last_epoch())
    referenced = {r[0] for r in state.select("file").collect()}
    assert referenced <= files
    # a reopened engine adopts the committed backend even if asked otherwise
    eng2 = CrawlEngine(spark, wd, epoch_seconds=60.0, state_backend="inline")
    assert eng2.state_backend == "store"
    assert eng2.store.meta("state_backend") == "store"


def test_engine_gc_reclaims_orphans(spark, tmp_path):
    """Crash orphans (files written, manifest never committed) and runs
    retired by compaction are reclaimed at the post-commit GC; everything
    the committed metadata still names survives."""
    wd = tmp_path / "crawl"
    eng = CrawlEngine(spark, wd, epoch_seconds=60.0, compact_every=2)
    eng.run(seed_ids=[1, 2, 3], max_epochs=1)
    seg_dir = str(wd / "segments")
    # plant a crash orphan: a valid name no metadata references
    orphan = os.path.join(seg_dir, "b99999-s000000-deadbeefdeadbeef.seg")
    with open(orphan, "wb") as f:
        f.write(b"GSEG1\n" + b"\x00" * 32)
    # drive past a compaction epoch (compact_every=2)
    eng.run(max_epochs=3)
    last = eng.store.last_epoch()
    assert last >= 2, "compaction epoch not reached"
    assert not os.path.exists(orphan)
    # every file referenced by ANY retained manifest view still exists,
    # and nothing outside those views remains (files a compaction retires
    # survive one extra commit while the predecessor manifest names them)
    referenced = set()
    for m in eng.store.manifests():
        df = eng.store.read_deltas(spark, "seen_state", max(m["epochs"]), manifest=m)
        if df is not None:
            referenced |= {r[0] for r in df.select("file").distinct().collect()}
    on_disk = {f for f in os.listdir(seg_dir) if f.endswith(".seg")}
    assert referenced <= on_disk
    stray = on_disk - referenced
    assert not stray, f"unreclaimed orphans: {stray}"
    # crawl results stay readable after GC
    assert eng.seen().count() > 0
    state = eng._read_seen_state(last)
    assert state.agg(F.sum("n_items")).first()[0] == eng.seen().select("url_id").distinct().count()


def test_uri_root_via_pyarrow(tmp_path):
    """file:// URI roots route through pyarrow.fs (the cluster DFS path)."""
    root = f"file://{tmp_path}/segs"
    ids, hs = _mk_arrays(500, 9)
    bloom_b, cuckoo_b = dedup._build_run(ids, hs)
    name = segstore.write_segment(root, 1, 0, bloom_b, cuckoo_b, ids, hs)
    segstore.clear_cache()
    b2, _c2, i2, _h2 = segstore.read_segment(root, name)
    assert b2 == bloom_b and (i2 == ids).all()
    # GC over the URI listing
    removed = segstore.gc_segments(root, set())
    assert removed == 1
    assert segstore.gc_segments(root, set()) == 0


def test_gc_preserves_manifest_fallback_view(spark, tmp_path):
    """commit() retains the predecessor manifest as a torn-write fallback;
    segment GC must not delete payload files that predecessor view still
    references, or the fallback resumes into FileNotFoundError. Simulate
    the fallback: crawl past a compaction (GC fires), roll back by
    deleting the newest manifest, and resume — the engine must come up on
    the predecessor view and finish the crawl."""
    import re

    wd = tmp_path / "crawl"
    eng = CrawlEngine(spark, wd, epoch_seconds=60.0, compact_every=2)
    eng.bootstrap(seed_ids=[1, 2, 3])
    while eng.store.last_epoch() is None or eng.store.last_epoch() < 3:
        if not eng.step():
            break
    assert eng.store.last_epoch() >= 2, "compaction epoch not reached"
    # the predecessor view must be fully readable from disk after GC
    manifests = eng.store.manifests()
    assert len(manifests) >= 2, "no predecessor manifest retained"
    seg_dir = str(wd / "segments")
    on_disk = {f for f in os.listdir(seg_dir) if f.endswith(".seg")}
    prev = manifests[1]
    df = eng.store.read_deltas(spark, "seen_state", max(prev["epochs"]), manifest=prev)
    prev_files = {r[0] for r in df.select("file").distinct().collect()}
    missing = prev_files - on_disk
    assert not missing, f"GC broke the fallback view: {missing}"
    # roll back: drop the newest manifest, resume on the predecessor
    names = sorted(
        (f for f in os.listdir(wd) if re.match(r"MANIFEST-\d+\.json$", f)),
        key=lambda f: int(re.findall(r"\d+", f)[0]),
    )
    os.remove(os.path.join(wd, names[-1]))
    eng2 = CrawlEngine(spark, wd, epoch_seconds=60.0, compact_every=2)
    eng2.run(seed_ids=[1, 2, 3])
    from gsccca_tax_records_scraper_spark import simulator

    sim = simulator.simulate_crawl([1, 2, 3], epoch_seconds=60.0)
    assert {r.url for r in eng2.seen().collect()} == sim.seen_urls


def test_gc_reclaims_dead_pid_tmp_files(tmp_path):
    """A worker killed between the tmp write and os.replace leaves
    '<name>.seg.tmp.<pid>' behind; GC reclaims it once the pid is dead but
    never touches a live writer's tmp file."""
    import subprocess
    import sys

    root = str(tmp_path / "segs")
    ids, hs = _mk_arrays(200, 3)
    bloom_b, cuckoo_b = dedup._build_run(ids, hs)
    name = segstore.write_segment(root, 2, 0, bloom_b, cuckoo_b, ids, hs)

    dead = subprocess.run([sys.executable, "-c", "import os; print(os.getpid())"],
                          capture_output=True, text=True, check=True)
    dead_pid = int(dead.stdout.strip())
    orphan_dead = os.path.join(root, f"{name}.tmp.{dead_pid}")
    orphan_live = os.path.join(root, f"{name}.tmp.{os.getpid()}")
    for p in (orphan_dead, orphan_live):
        with open(p, "wb") as f:
            f.write(b"partial")

    removed = segstore.gc_segments(root, {name})
    assert removed == 1
    assert not os.path.exists(orphan_dead)
    assert os.path.exists(orphan_live)  # live pid: possibly mid-write
    assert os.path.exists(os.path.join(root, name))  # referenced seg kept


def test_gc_tmp_cross_host_grace(tmp_path):
    """Tmp files tagged with ANOTHER host's name (shared-NFS writer on a
    different box) have no pid table to consult here: kept while fresh,
    reclaimed past the grace age. A same-host file whose pid is alive but
    whose mtime is past the grace age is pid REUSE (a real writer finishes
    in seconds), not a live writer, and is reclaimed too."""
    import socket
    import time

    root = str(tmp_path / "segs")
    os.makedirs(root)
    fresh_remote = os.path.join(root, "b00001-s000000-aaaa.seg.tmp.1@elsewhere")
    old_remote = os.path.join(root, "b00001-s000001-bbbb.seg.tmp.1@elsewhere")
    old_local_live = os.path.join(
        root, f"b00001-s000002-cccc.seg.tmp.{os.getpid()}@{socket.gethostname()}"
    )
    for p in (fresh_remote, old_remote, old_local_live):
        with open(p, "wb") as f:
            f.write(b"partial")
    past = time.time() - 2 * segstore._tmp_grace_sec()
    os.utime(old_remote, (past, past))
    os.utime(old_local_live, (past, past))
    removed = segstore.gc_segments(root, set())
    assert removed == 2
    assert os.path.exists(fresh_remote)  # possibly mid-write on the other host
    assert not os.path.exists(old_remote)  # abandoned: past grace
    assert not os.path.exists(old_local_live)  # live pid + old file = pid reuse


def test_gc_skips_when_state_view_unreadable(spark, tmp_path, monkeypatch):
    """A committed manifest whose seen_state view cannot be read right now
    (flaky mount, torn object-store read) means the referenced set would be
    INCOMPLETE — GC must delete NOTHING rather than reclaim live payloads."""
    wd = tmp_path / "crawl"
    eng = CrawlEngine(spark, wd, epoch_seconds=60.0)
    eng.run(seed_ids=[1], max_epochs=1)
    seg_dir = str(wd / "segments")
    before = set(os.listdir(seg_dir))
    assert any(f.endswith(".seg") for f in before)
    monkeypatch.setattr(eng.store, "read_deltas", lambda *a, **k: None)
    assert eng._gc_segments() == 0
    assert set(os.listdir(seg_dir)) == before
    # no readable manifest at all: likewise a no-op, never "delete all"
    monkeypatch.setattr(eng.store, "manifests", lambda: [])
    assert eng._gc_segments() == 0
    assert set(os.listdir(seg_dir)) == before


def test_uri_write_recreates_removed_root(tmp_path):
    """The per-process 'dir already created' memo goes stale when the root
    is removed and recreated under a surviving worker; the write path must
    re-create the directory and retry instead of failing the epoch."""
    import shutil

    root = f"file://{tmp_path}/segs"
    ids, hs = _mk_arrays(100, 11)
    bloom_b, cuckoo_b = dedup._build_run(ids, hs)
    segstore.write_segment(root, 1, 0, bloom_b, cuckoo_b, ids, hs)
    shutil.rmtree(tmp_path / "segs")
    ids2, hs2 = _mk_arrays(100, 12)
    bloom2, cuckoo2 = dedup._build_run(ids2, hs2)
    name2 = segstore.write_segment(root, 1, 1, bloom2, cuckoo2, ids2, hs2)
    segstore.clear_cache()
    _b, _c, i2, _h = segstore.read_segment(root, name2)
    assert (i2 == ids2).all()
