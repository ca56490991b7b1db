"""SQL entry point: run ANSI SQL over the engine's registered tables.

Catalyst compiles `spark.sql` text to the same plans as the DataFrame
API, so the full optimizer surface (pushdown, pruning, join planning,
AQE) applies. This is the interactive/BI-facing door to the engine —
every fixture (or production) table becomes a view once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rust_etl_spark.sources import register_views


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the table set as views (idempotent) and run ``query``."""
    register_views(spark, sf_dir)
    return spark.sql(query)
