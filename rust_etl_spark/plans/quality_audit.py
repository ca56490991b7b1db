"""Data-quality audit over the warehouse tables — the constraint-check
pass (Deequ/Great-Expectations shape) a pipeline runs before publishing
a snapshot.

The reference has no constraint checking (its only guards are the
empty-response/empty-table aborts, src/processor.rs:31-35); this module
extends that fail-soft posture into declarative, set-based audits:
every rule is an anti-join or domain predicate over the full table,
aggregated to one violation-count row per rule — never a row-by-row
driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_etl_spark.plans.catalog import register
from rust_etl_spark.sources import load_table


@register(
    "integrity_audit",
    oracle="""
        SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
            SELECT 'lineitem_orphan_order' AS rule, count(*) AS n_violations
            FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
            UNION ALL
            SELECT 'order_orphan_customer', count(*)
            FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
            UNION ALL
            SELECT 'lineitem_nonpositive_quantity', count(*)
            FROM lineitem WHERE l_quantity <= 0
            UNION ALL
            SELECT 'lineitem_negative_price', count(*)
            FROM lineitem WHERE l_extendedprice < 0
            UNION ALL
            SELECT 'lineitem_discount_out_of_range', count(*)
            FROM lineitem WHERE l_discount < 0 OR l_discount > 1
            UNION ALL
            SELECT 'lineitem_shipped_before_order', count(*)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate < o_orderdate
            UNION ALL
            SELECT 'order_nonpositive_total', count(*)
            FROM orders WHERE o_totalprice <= 0
        ) t
        ORDER BY rule
    """,
    doc="Referential + domain integrity audit: orphan fact rows (anti-joins "
    "on the id columns only), non-positive quantities/prices, discount "
    "range, ship-before-order violations — one violation-count row per "
    "rule, the pre-publish constraint report.",
)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit (one row per rule).

    Referential rules are LEFT ANTI joins carrying only the key
    columns (at 100 TB: id-width shuffles, and the dim side of each
    anti-join broadcasts); domain rules are scan-local predicate
    counts that collapse map-side. The seven rule counts union into a
    KB-sized report — there is no driver-side iteration and every
    rule reads the fact table at most once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def cnt(df: DataFrame, rule: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
            F.lit(rule).alias("rule"), "n_violations"
        )

    orphan_li = li.select("l_orderkey").join(
        orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    )
    orphan_ord = orders.select("o_custkey").join(
        F.broadcast(cust.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    )
    shipped_early = (
        li.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
    )
    report = (
        cnt(orphan_li, "lineitem_orphan_order")
        .unionByName(cnt(orphan_ord, "order_orphan_customer"))
        .unionByName(cnt(li.filter(F.col("l_quantity") <= 0), "lineitem_nonpositive_quantity"))
        .unionByName(cnt(li.filter(F.col("l_extendedprice") < 0), "lineitem_negative_price"))
        .unionByName(
            cnt(
                li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
                "lineitem_discount_out_of_range",
            )
        )
        .unionByName(cnt(shipped_early, "lineitem_shipped_before_order"))
        .unionByName(cnt(orders.filter(F.col("o_totalprice") <= 0), "order_nonpositive_total"))
    )
    return report.orderBy("rule")
