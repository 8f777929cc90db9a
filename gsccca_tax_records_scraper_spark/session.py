"""SparkSession factory tuned for the crawl engine.

Local-mode settings mirror what a 1000-executor cluster run would set via
spark-submit --conf; the parallelism knobs are parameterized so bench.py can
run the same job at local[8] and local[32] (the sandbox stand-in for N vs 4N
executors, per BASELINE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gsccca_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    executors: tuple[int, int, int] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> local[*]. shuffle_partitions defaults to the core count:
    at cluster scale this would be ~2-3x total executor cores; AQE coalesces
    small shuffles back down either way.

    executors=(n, cores_each, mem_mb) runs in local-cluster mode: n REAL
    executor JVMs forked on this machine, each with its own heap/GC/python
    workers — the faithful sandbox stand-in for an n-executor cluster (the
    north rule's N vs 4N executor scaling), unlike local[k] thread scaling
    which shares one JVM. The repo is exported to the executors' PYTHONPATH
    (the spark-submit --py-files equivalent).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else os.cpu_count() or 4
    if executors is not None:
        n_exec, cores_each, mem_mb = executors
        master = f"local-cluster[{n_exec},{cores_each},{mem_mb}]"
        cores = n_exec * cores_each
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # collect_list/collect_set aggregations (posting-list pair generation
        # in textdedup/similarity) run as ObjectHashAggregate, whose
        # sort-based fallback triggers after a mere 128 distinct keys by
        # default — on millions of shingle keys that degenerates to a full
        # sort (measured 19.5s vs 7.3s on ngram_overlap_pairs at sf0.1).
        # Raising it removes the memory-bounding fallback SESSION-WIDE, so
        # the engine's invariant is: every fat-value aggregation bounds its
        # per-key state BEFORE collecting (ngram: max_df count semi-join;
        # LSH/cosine buckets: window-count gate; line assembly: line
        # length) — an unbounded collect_list under this setting would hold
        # every group's list in the hash map with no spill path.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", str(1 << 22))
        # the engine's cached frames are write-once-read-once epoch
        # intermediates (dedup output consumed and unpersisted within the
        # epoch), so columnar-cache compression spends CPU on cache entries
        # that live seconds — measured ~0.7s/epoch on the 24M-candidate
        # bench dedup. Long-lived caches would want it back on.
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        # ParallelGC + a moderate heap: G1 on a huge heap stalls badly with
        # 32 executor threads in one JVM (measured 73s -> 5s on an 8M-row
        # window+join at local[32])
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    if executors is not None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder.config("spark.executor.memory", f"{executors[2]}m")
            .config("spark.executorEnv.PYTHONPATH", repo_root)
            .config("spark.python.worker.reuse", "true")
        )
    # single-JVM local mode funnels every shuffle through one disk — a
    # local-mode artifact a real cluster doesn't have (per-executor disks).
    # Use RAM-backed tmpfs for shuffle/spill when available.
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
