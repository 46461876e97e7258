"""SparkSession factory with the engine's scale-oriented defaults.

Local mode in this sandbox; on a real cluster the same configs apply (AQE,
skew-join splitting, Arrow batching) and the master/executor settings come
from spark-submit.  Iceberg extensions are attached only when the runtime
jars are available (gated; parquet tables otherwise — see plans/catalog.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "minimizer-jaccard-estimator-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # make this package importable on python workers regardless of the
    # driver's cwd (cluster equivalent: spark-submit --py-files)
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root

    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x cores locally; on a cluster AQE coalesces from a higher initial
        shuffle_partitions = max(2 * cpus, 8)
    builder = SparkSession.builder
    # spark-submit's --master must win; only default to local[] when nothing
    # configured it (builder options would otherwise override spark-submit)
    submit_args = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    if "--master" not in submit_args and not os.environ.get("SPARK_MASTER_URL"):
        builder = builder.master(f"local[{cpus}]")
    # join-strategy envelope (guide §3.1/§9), parameterised for scale:
    # - prefer shuffled-hash over sort-merge: the engine's joins are narrow
    #   equi-joins (pair tables vs per-doc sketch tables) where the sort adds
    #   nothing; sort-merge remains the planner's fallback when the
    #   shuffled-hash size conditions don't hold
    # - AQE runtime broadcast threshold raised above the 10 MB static default:
    #   the per-doc sketch/signature tables sit behind Arrow UDFs, so the
    #   static planner cannot estimate them, but at runtime a corpus-keyed
    #   side that materialises under this many bytes is cheaper to broadcast
    #   than to shuffle the (quadratic-ish) pair table towards — 64 MB is
    #   safe on any executor with >= 2 GB of memory; tune down via env on
    #   memory-constrained clusters
    adaptive_broadcast = os.environ.get("SPARK_GRAFT_ADAPTIVE_BROADCAST", "64m")
    builder = (
        builder.appName(app_name)
        # AQE: runtime re-plan, skew-join splitting, partition coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", adaptive_broadcast)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow is the hot path for every sketch kernel
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # sized so a 128MB-ish input split per task at 100TB scale
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # local mode: the driver JVM is also every executor, so size the heap
        # with the task-slot count (~0.75 GB of execution memory per
        # concurrent task, floor 8g) — at 8 GB fixed, 32 slots get ~250 MB
        # each and wide hash aggregates (the 50M-row candidate distinct)
        # spill and fall back to sort-based aggregation (measured 47 s -> 13 s
        # at sf1.0).  On a real cluster --executor-memory supersedes this;
        # the same GB-per-slot sizing rule applies there (guide §5).
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", f"{max(8, (cpus * 3) // 4)}g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
