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


def test_sketch_union_rollup_error_bound(spark, sf_dir):
    """Unioned day-sketches must estimate weekly/total distinct users
    within HLL's error envelope (lgConfigK=12 -> ~1.6% rsd; assert 5%),
    and the union-of-partials total must not drift from a direct
    one-shot estimate."""
    from pyspark.sql import functions as F

    from rust_etl_spark.plans import catalog
    from rust_etl_spark.sources import load_table

    out = {r["scope"]: r["est_users"] for r in catalog.get("sketch_union_rollup").fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts_ns div 86400000000000").alias("day"), "user_id"
    )
    exact_total = ev.select("user_id").distinct().count()
    assert abs(out["total"] - exact_total) <= max(2, 0.05 * exact_total)
    exact_week = {
        r["week"]: r["n"]
        for r in ev.select(F.expr("day div 7").alias("week"), "user_id")
        .distinct().groupBy("week").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for wk, n in exact_week.items():
        assert abs(out[f"week_{wk}"] - n) <= max(2, 0.05 * n), (wk, n, out)
