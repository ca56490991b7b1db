"""Partition-aware sinks: partitioned parquet, bucketed tables.

These are the two levers that shape downstream scan cost at 100 TB:

- **Partitioned layout** (`partitionBy`): coarse, low-cardinality keys
  (date, region, flag). Readers with a matching predicate scan only
  the hit directories (partition pruning — visible as PartitionFilters
  in the plan). Cap per-file size with maxRecordsPerFile so a skewed
  partition still parallelizes.
- **Bucketed tables** (`bucketBy` + saveAsTable): high-cardinality
  join/agg keys. Two tables bucketed on the same key join with ZERO
  exchanges — the shuffle is paid once at write time, amortized over
  every subsequent join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    max_records_per_file: int = 1_000_000,
) -> None:
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    spark = df.sparkSession
    # A managed-table *location* can outlive the catalog entry (new
    # session, old warehouse dir) and then block saveAsTable — drop
    # both the entry and any orphaned location first.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
