"""SparkSession factory tuned for this engine.

Local-mode defaults follow the driver environment (local[$SPARK_GRAFT_CPUS]),
but every knob here is chosen to also hold on a real multi-executor
cluster at large scale: AQE on (runtime coalesce + skew-join), broadcast
threshold sized for dimension tables, UTC session time zone so results
are comparable across engines, Arrow enabled for the few Pandas-UDF
operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "rust_etl_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    ``shuffle_partitions`` defaults to the local core count: on
    local[N] the 200-partition default just adds scheduling overhead,
    while on a big cluster AQE coalesces post-shuffle partitions to
    the right size anyway (`spark.sql.adaptive.coalescePartitions`).
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # events.parquet stores ts as TIMESTAMP(NANOS): read as long
        # (nanos) and convert in the loader, as Spark has no nanos type.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Byte-small but compute-heavy tables (embeddings: 64-float
        # arrays driving O(N*C) distance folds) under-split at the
        # default 4 MB openCost floor — a 6 MB single-file scan plans
        # 1-2 tasks and serializes 100% of the kernel work on one core
        # (the 10x scaling run measured kmeans_iterate at 46x for 10x
        # rows from exactly this). Lowering the split floor restores
        # row-group-grain parallelism; on a real cluster the file count
        # provides it and these two mostly don't bind.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
