"""Partition pruning, bucketed shuffle-free joins, salted join
equivalence — the scale levers must be observable in plans/results."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_etl_spark.operators.joins import salted_join
from rust_etl_spark.sinks import read_table, write_bucketed_table, write_partitioned
from rust_etl_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    out = str(tmp_path / "li_part")
    write_partitioned(li, out, ["l_returnflag"])
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters", 1)[1][:200]
    expect = li.filter(F.col("l_returnflag") == "R").count()
    assert back.count() == expect > 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    write_bucketed_table(orders, "b_orders", ["o_custkey"], n_buckets=4)
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "b_cust", ["o_custkey"], n_buckets=4
    )
    j = read_table(spark, "b_orders").join(read_table(spark, "b_cust"), "o_custkey")
    plan = _plan(j)
    assert "Exchange hashpartitioning" not in plan, "bucketed join must not reshuffle"
    assert j.count() == orders.join(cust, orders.o_custkey == cust.c_custkey).count()


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = salted_join(
        li, orders, "l_orderkey", n_salts=4, probe_salt_source="l_linenumber"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    assert plain.collect() == salted.collect()
