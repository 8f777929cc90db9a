#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4): per-query isolation
with the noop sink, plan capture, and repeat timing.

This file is NOT part of the driver contract — bench.py stays the frozen
measurement harness. Use:

  python bench_extra.py queries [name ...]   # time headline queries (noop sink)
  python bench_extra.py plans OUTDIR [name ...]  # write .explain("formatted")
  python bench_extra.py all OUTDIR           # plans + timings in one session

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "tpch_q1",
    "revenue_by_segment",
    "argmax_order",
    "line_reconstruction",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "ngram_overlap_pairs",
    "cosine_topk_bruteforce",
    "quality_score",
    "media_features",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session():
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F  # noqa: F401

    from gsccca_tax_records_scraper_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", cores=cores,
                      shuffle_partitions=max(cores, 8))
    # same untimed warmup shape as bench.run_headline: generic JVM machinery
    # + the Python worker pool, no headline plan touched
    warm = spark.range(0, 1_000_000, 1, cores).selectExpr(
        "id % 97 as g", "cast(id as double) * 2.0 as v", "concat('w', id) as s"
    )
    _noop(warm.groupBy("g").agg({"v": "sum", "s": "max"}))
    _noop(
        warm.limit(cores * 256)
        .repartition(cores)
        .mapInPandas(lambda it: it, "g bigint, v double, s string")
    )
    qs = {**entrymod.queries(), "media_features": entrymod.q_media_features}
    return spark, qs


def time_queries(names: list[str]) -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    spark, qs = _session()
    out: dict[str, dict] = {}
    for name in names:
        per = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.monotonic()
            _noop(qs[name](spark, sf_dir))
            per.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"first": per[0], "min": min(per), "reps": per}
        print(f"[{name}] first={per[0]} min={min(per)} reps={per}", flush=True)
    total_first = round(sum(v["first"] for v in out.values()), 3)
    total_min = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps({"queries": out, "total_first": total_first,
                      "total_min": total_min}))
    spark.stop()
    return out


def write_plans(outdir: str, names: list[str], suffix: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, qs = _session()
    Path(outdir).mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = Path(outdir) / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print(f"wrote {p}", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        names = sys.argv[2:] or HEADLINE
        time_queries(names)
    elif mode == "plans":
        outdir = sys.argv[2]
        suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")
        names = sys.argv[3:] or HEADLINE
        write_plans(outdir, names, suffix)
    else:
        print(__doc__)
        sys.exit(2)
