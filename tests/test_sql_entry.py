"""SQL entry point: text queries over registered views produce the
same results as the DataFrame API."""

from __future__ import annotations

import pyspark.sql.functions as F

from rust_etl_spark.sources import load_table
from rust_etl_spark.sql import sql

SF = "/root/testdata/sf0.001"


def test_sql_matches_dataframe_api(spark):
    via_sql = sql(
        spark,
        SF,
        """
        SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_returnflag
        """,
    )
    via_df = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(map(tuple, via_df.collect()))


def test_sql_join_across_views(spark):
    out = sql(
        spark,
        SF,
        "SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
    )
    rows = {r["r_name"]: r["n"] for r in out.collect()}
    assert sum(rows.values()) == 25  # all nations mapped
