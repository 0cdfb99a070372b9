"""SparkSession factory with scale-oriented defaults.

Defaults are tuned so the same code runs on local[N] for tests and on a
1000-executor cluster unchanged: AQE on (runtime shuffle-partition coalescing
+ skew-join splitting), Arrow on (all pandas/Arrow UDF exchange is
vectorized), and a shuffle-partition count sized from the available
parallelism rather than the Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bifrost_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the bench harness can run the identical job at two parallelism levels
    (the sandbox stand-in for N vs 4N executor clusters).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match the core count locally; on a real cluster this is set to
        # 2-3x total executor cores via spark-submit conf.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    # Shuffle/spill scratch space: a real cluster gives every executor its
    # own local SSD for shuffle files; a single sandbox JVM with 32 task
    # threads funnels them all through one ext4 mount, and the per-file
    # create/fsync contention grows with the thread count (measured: it
    # inverted the local[8]→local[32] scaling).  tmpfs is the faithful
    # LOCAL-MODE stand-in for per-executor NVMe — and only local mode: on a
    # real cluster (--master spark://... / yarn / k8s) shuffle spill exists
    # to relieve memory pressure, and routing it to RAM-backed tmpfs would
    # make large shuffles fail with ENOSPC exactly when they should have
    # spilled to disk.  Respected only if the user has not already set
    # SPARK_LOCAL_DIRS / spark.local.dir.
    local_dirs = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dirs and master.startswith("local[") and os.path.isdir("/dev/shm"):
        local_dirs = "/dev/shm/bifrost_spark_local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if local_dirs:
        builder = builder.config("spark.local.dir", local_dirs)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
