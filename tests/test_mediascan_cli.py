"""S10 binary media scan + the spark-submit CLI entry point."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

from gsccca_tax_records_scraper_spark.sources.mediascan import scan_media_dir

REPO = Path(__file__).resolve().parent.parent


def test_scan_media_dir(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.png").write_bytes(b"\x89PNG fake image bytes")
    (tmp_path / "sub" / "b.pdf").write_bytes(b"%PDF fake doc")
    (tmp_path / "ignore.txt").write_text("not media")
    df = scan_media_dir(spark, str(tmp_path))
    rows = {Path(r.path).name: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.pdf"}
    assert rows["a.png"].n_bytes == 21
    assert rows["a.png"].media_ref.startswith("sha1:")
    assert bytes(rows["b.pdf"].media_bytes) == b"%PDF fake doc"


def test_scan_media_dir_size_filter(spark, tmp_path):
    (tmp_path / "small.png").write_bytes(b"x")
    (tmp_path / "big.png").write_bytes(b"y" * 1000)
    df = scan_media_dir(spark, str(tmp_path), max_bytes=100)
    assert [Path(r.path).name for r in df.collect()] == ["small.png"]


def test_run_crawl_cli(tmp_path):
    """The spark-submit entry point end-to-end (fresh process)."""
    out = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "run_crawl.py"),
            "--workdir", str(tmp_path / "wd"),
            "--seeds", "5", "--epoch-seconds", "120", "--cores", "8",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["seen_urls"] > 0 and payload["documents"] > 0
    # resume invocation: no seeds, nothing left to do, still exits cleanly
    out2 = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "run_crawl.py"),
            "--workdir", str(tmp_path / "wd"), "--cores", "8",
        ],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    payload2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert payload2["seen_urls"] == payload["seen_urls"]
    assert payload2["epochs"] == payload["epochs"]  # nothing new committed
    assert payload2["epochs_this_run"] == 0  # frontier already drained
