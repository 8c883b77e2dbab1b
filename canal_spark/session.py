"""SparkSession factory with scale-appropriate defaults.

The reference hand-tunes its pipeline parallelism (threads = cores x 0.6,
ring 256 — parse/.../AbstractEventParser.java:96-98); on Spark the
equivalents are shuffle partitioning, AQE, and Arrow batching, set here
once so every job and test shares the same tuned session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "canal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the maintenance engine.

    Defaults hold at cluster scale: AQE coalesces/splits shuffle
    partitions at runtime (so ``shuffle_partitions`` is a ceiling, not a
    bet), skew-join splitting is on for hot ``doc_id`` keys, and Arrow
    is enabled for the pandas-UDF kernels (Z-order/Hilbert keys).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    # "from-submit": cluster deployment — spark-submit supplies
    # spark.master; setting it here would override the cluster manager
    if master == "from-submit":
        master = None
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b
        # AQE: runtime coalesce + skew-join split — replaces the
        # reference's fixed pk-hash lane count (RdbSyncService.java:46).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDFs (vectorized kernels; zero per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet scan sizing: 128MB splits — keeps ~100TB scans at
        # ~800k tasks, each fitting executor memory with token arrays.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Broadcast threshold: CDC batches are usually tiny next to the
        # target table — let Catalyst broadcast them.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Containerized JVMs misdetect available processors, which makes
    # G1's ergonomics (GC worker count, region sizing) collapse at
    # high task parallelism — measured 10-30x slowdowns at local[32]
    # on a 32-core box.  Pin the processor count and use the
    # throughput collector: this is a batch engine, pause times are
    # irrelevant next to allocation throughput.
    #
    # LOCAL MODE ONLY: on a cluster the driver machine's cpu_count is
    # wrong for executors, and spark-submit-supplied extraJavaOptions
    # must not be clobbered — there, GC tuning belongs in submit conf.
    if master is not None and master.startswith("local"):
        gc_opts = f"-XX:ActiveProcessorCount={os.cpu_count()} -XX:+UseParallelGC"
        b = b.config("spark.driver.extraJavaOptions", gc_opts).config(
            "spark.executor.extraJavaOptions", gc_opts
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
