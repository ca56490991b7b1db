"""Grouped-map operator via applyInPandas: per-group z-score
normalization of customer balances.

Demonstrates the engine's grouped-pandas path (Arrow batch per group)
WITH a full SQL oracle — the math (x - mean)/stddev is deterministic
enough to cross-check when rounded. In production the same shape
serves per-group model scoring, outlier trimming, resampling.

Scale: one shuffle on the grouping key; each group materializes as a
pandas frame, so groups must fit in executor memory — the grouping
key here (nation, ~200 customers/group at sf1) is chosen for that.
Window functions solve THIS particular query without Python at all
(see the oracle); the operator exists for the cases they cannot.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from rust_etl_spark.plans.catalog import register
from rust_etl_spark.sources import load_table

_OUT_SCHEMA = "c_custkey bigint, c_nationkey int, zscore double"


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["c_acctbal"].mean()
    sd = pdf["c_acctbal"].std(ddof=1)  # sample stddev = stddev_samp
    # SQL semantics: stddev_samp of a single row is NULL, so a
    # singleton group's zscore is NULL (pandas std gives NaN there,
    # which Arrow maps to null — exactly the oracle's behavior).
    z = (pdf["c_acctbal"] - mean) / sd
    return pd.DataFrame(
        {"c_custkey": pdf["c_custkey"], "c_nationkey": pdf["c_nationkey"], "zscore": z.round(4)}
    )


def groupwise_zscore(df: DataFrame) -> DataFrame:
    return df.select("c_custkey", "c_nationkey", "c_acctbal").groupBy("c_nationkey").applyInPandas(
        _normalize, schema=_OUT_SCHEMA
    )


@register(
    "grouped_normalize",
    oracle="""
        SELECT c_custkey, c_nationkey,
               round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                     / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 4) AS zscore
        FROM customer
    """,
    doc="Per-group z-score via applyInPandas (grouped Arrow batches); oracle uses window functions.",
)
def grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return groupwise_zscore(load_table(spark, sf_dir, "customer"))
