"""Incrementally-maintained aggregate: a checkpointed file stream keeps
a materialized per-key summary parquet up to date as new data lands —
the streaming analogue of a nightly GROUP BY recompute, without
rescanning history.

Mechanics: each micro-batch is pre-aggregated (count/sum per key),
then merged into the summary table with ``upsert_parquet`` by summing
onto the stored partials (count and sum are algebraic, so batch
partials compose exactly). The summary stays queryable between
batches, and the upsert's rename-aside swap keeps a live directory at
every instant. At scale the summary table is keyed by a
low-cardinality dimension and is orders of magnitude smaller than the
stream history.

Exactly-once caveat: foreachBatch replays a failed batch; because this
sink ADDS onto stored partials (not idempotent per replay), restart
semantics are at-least-once for a batch that crashed mid-upsert. The
upsert itself is crash-safe (old summary intact until the swap); for
end-to-end exactly-once, store the last applied epoch_id next to the
summary and skip batches already applied — noted, not implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_etl_spark.operators.upsert import upsert_parquet


def start_incremental_aggregate(
    spark: SparkSession,
    source_dir: str,
    summary_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    key: str,
    value: str,
):
    """Maintain ``summary_path`` = per-``key`` (n, total of ``value``)
    over all JSON-lines files that ever landed in ``source_dir``."""
    import os

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).json(source_dir)

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        partial = batch_df.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"), F.sum(value).alias("total")
        )
        if os.path.exists(summary_path):
            prev = spark.read.parquet(summary_path)
            merged = (
                prev.unionByName(partial)
                .groupBy(key)
                .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
            )
        else:
            merged = partial
        # collect to driver is NOT used: upsert rewrites via Spark jobs
        upsert_parquet(spark, summary_path, merged, [key])

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
