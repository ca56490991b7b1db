"""Partition pruning, bucketed shuffle-free joins, salted join
equivalence — the scale levers must be observable in plans/results."""

from __future__ import annotations

import os

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


def test_zordered_write_clusters_both_dimensions(spark, tmp_path):
    """Z-order clustering must shrink per-row-group min/max spans on
    BOTH key columns vs an unclustered write — that span shrinkage is
    exactly what lets parquet footer stats skip row groups for
    predicates on either column."""
    import pyarrow.parquet as pq

    from rust_etl_spark.sinks import write_zordered
    from rust_etl_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    def mean_span_product(path: str) -> float:
        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                }
                sp = cols["l_partkey"]
                ss = cols["l_suppkey"]
                spans.append(
                    (sp.max - sp.min + 1) * (ss.max - ss.min + 1)
                )
        return sum(spans) / len(spans)

    plain = str(tmp_path / "plain")
    li.repartition(4).write.mode("overwrite").option("maxRecordsPerFile", 500).parquet(plain)
    zed = str(tmp_path / "zed")
    write_zordered(li, zed, "l_partkey", "l_suppkey", max_records_per_file=500)

    assert mean_span_product(zed) < mean_span_product(plain) / 4
    # identical content, just relaid
    assert spark.read.parquet(zed).count() == li.count()


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
