"""SparkSession factory tuned for this engine.

Design notes (100 TB posture): AQE on (runtime join re-plan, skew-join
splitting, partition coalescing), shuffle partitions sized by env,
UTC session timezone so timestamp semantics match the DuckDB oracle,
Arrow enabled for every pandas boundary. On a real cluster the same
builder is used — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "empdia_iceberg_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    Env knobs: ``SPARK_GRAFT_CPUS`` (local parallelism, default 32),
    ``SPARK_GRAFT_SHUFFLE`` (shuffle partitions, default = cpus).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus)))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: driver is the only JVM; give it headroom but leave
        # room for the OS. Harmless if already set by the launcher.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parallelism floor: at small scale factors the default 128 MB
        # maxPartitionBytes yields ~3 input splits, idling 29/32 cores
        # (BENCH_r01 showed 3-task stages). Force at least one split per
        # core; at cluster scale files are large enough that
        # maxPartitionBytes governs and this floor is a no-op.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # openCostInBytes floors the split size at 4 MB by default, which
        # defeats minPartitionNum on ~10 MB files; lower it so small-SF
        # scans really do fan out to all cores.
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        # Don't let AQE coalesce tiny-SF shuffles below the core count.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
