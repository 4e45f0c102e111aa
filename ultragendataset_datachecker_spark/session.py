"""SparkSession factory with scale-oriented defaults.

AQE on (runtime re-plan, skew-join splitting), Arrow on (all Python<->JVM
crossings are vectorized batches), small-file coalescing, and a shuffle
partition count appropriate to the parallelism level.  These are the same
settings a 1000-executor cluster run would submit with ``spark-submit --conf``;
here they configure local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ultragendataset-datachecker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # match shuffle fan-out to core count locally; a real cluster would
        # use 2-3x total cores (AQE coalesces the excess at runtime anyway)
        try:
            cores = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            cores = 32
        shuffle_partitions = max(cores, 8)
    else:
        try:
            cores = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            cores = 32

    # local[N] runs N concurrent tasks inside ONE JVM that is also the
    # driver: size the shared heap with the task slots (0.5 GB/slot, floor
    # 8 GB) instead of a flat constant — at local[32] an 8 GB heap spent
    # 30-40s/job in GC under the engine's block-store + agg working set
    # (event-log audit r6). Cluster submissions size executors explicitly;
    # SPARK_DRIVER_MEMORY still overrides.
    default_mem = f"{max(8, cores // 2)}g"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", default_mem))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master.startswith("local-cluster"):
        # multi-JVM executors spawn their own Python workers, which must
        # import this (not pip-installed) package: ship the repo root on the
        # executor PYTHONPATH instead of relying on the caller's shell env
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root,
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
