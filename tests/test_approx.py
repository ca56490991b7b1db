"""Approximate sketches: estimates must be within documented bounds
of the exact answers (the cross-engine oracle can't check these —
sketch internals are engine-specific)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_etl_spark.plans import catalog
from rust_etl_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_bounds(spark):
    approx = {
        r["l_returnflag"]: (r["approx_orders"], r["approx_median_price"])
        for r in catalog.get("approx_distinct").fn(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: (r["n"], r["med"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("med"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, (n_exact, med_exact) in exact.items():
        n_approx, med_approx = approx[flag]
        # rsd=0.02 => ~3sigma bound at 6%
        assert abs(n_approx - n_exact) / n_exact < 0.06, f"{flag}: HLL off >6%"
        assert abs(med_approx - med_exact) / med_exact < 0.05, f"{flag}: approx median off >5%"
