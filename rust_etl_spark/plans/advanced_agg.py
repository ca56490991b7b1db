"""Advanced aggregation coverage: range-frame windows, arg-max
selection, approximate sketches.

``approx_distinct`` is intentionally rows-only: HLL/KLL sketch
internals differ across engines by design, so the driver records the
weaker check and pytest bounds the estimation error against the exact
answer instead (tests/test_approx.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_etl_spark.plans.catalog import register
from rust_etl_spark.sources import load_table


@register(
    "window_range_frame",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               CAST(count(*) OVER (
                    ORDER BY o_totalprice
                    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near,
               round(sum(o_totalprice) OVER (
                    ORDER BY o_totalprice
                    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS sum_near
        FROM orders
    """,
    doc="Value-based RANGE frame: per order, count/sum of orders within 1000 below its price "
    "(frame membership is value-determined, so ties need no break).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Python Window API only takes integral range offsets; the SQL
    # form supports numeric frames directly (same Catalyst plan).
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               CAST(count(*) OVER (
                    ORDER BY o_totalprice
                    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near,
               round(sum(o_totalprice) OVER (
                    ORDER BY o_totalprice
                    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS sum_near
        FROM orders_v
        """
    )


@register(
    "agg_argmax",
    oracle="""
        SELECT c_nationkey,
               arg_max(c_custkey, c_acctbal * 1000000 + c_custkey) AS richest_custkey,
               round(max(c_acctbal), 2) AS top_bal
        FROM customer GROUP BY c_nationkey
    """,
    doc="Per-group arg-max (max_by) with a tie-safe composite ordering key.",
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    ord_key = F.col("c_acctbal") * 1_000_000 + F.col("c_custkey")
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", ord_key).alias("richest_custkey"),
        F.round(F.max("c_acctbal"), 2).alias("top_bal"),
    )


@register(
    "approx_distinct",
    oracle=None,  # sketch internals are engine-specific; bounded in tests/test_approx.py
    doc="Approximate sketches: HLL distinct + approximate percentile per return flag (rows-only check).",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
    )
