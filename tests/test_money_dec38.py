"""Cross-engine lock for the DECIMAL(38,0) escape-hatch accumulator
(functions/money.py ``dec38_sql`` — round-15 VERDICT #4: the headroom
guard's failure message must point at a TESTED code path, not a named
idea).

Three claims, each pinned here:

1. In-range identity: on the adversarial money grid the DEC38 path
   produces bit-identical sums to the BIGINT path on BOTH engines
   (the cast widens per-row exact integers; nothing rounds).
2. Beyond int64: on a sum that exceeds int64, the BIGINT path FAILS —
   under Spark 4's default ANSI mode it raises ARITHMETIC_OVERFLOW
   (pinned here; under non-ANSI it would wrap silently instead) —
   while the DEC38 accumulator returns the exact value on both
   engines, equal to Python bigint arithmetic.
3. Fixture identity: groupby_agg_dec38's reconstituted sum_charge is
   value-identical to groupby_agg's BIGINT-path sum_charge on the
   active fixture tier.
"""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from rust_etl_spark.functions.money import CHARGE_SCALED, CHARGE_SCALED_DEC38
from tests.conftest import SF_ORACLE
from tests.test_money_portability import VALUES

_SCHEMA = "l_extendedprice double, l_discount double, l_tax double"


def _grid_rows():
    # the adversarial price grid crossed with boundary-ish rates
    rates = [(0.0, 0.0), (0.05, 0.07), (0.045, 0.075), (0.08, 0.0)]
    return [
        (p, d, t) for p in VALUES for d, t in rates
    ]


def test_dec38_matches_bigint_path_in_range(spark):
    rows = _grid_rows()
    sdf = spark.createDataFrame(rows, _SCHEMA)
    got = sdf.select(
        F.sum(F.expr(CHARGE_SCALED)).cast("long").alias("big"),
        F.sum(F.expr(CHARGE_SCALED_DEC38)).alias("dec"),
    ).collect()[0]
    assert int(got["dec"]) == got["big"]

    con = duckdb.connect()
    con.execute("CREATE TABLE g (l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
    big_d, dec_d = con.execute(
        f"SELECT CAST(sum({CHARGE_SCALED}) AS BIGINT), sum({CHARGE_SCALED_DEC38}) FROM g"
    ).fetchone()
    assert big_d == got["big"]
    assert int(dec_d) == got["big"]


def test_dec38_exact_beyond_int64_where_bigint_wraps(spark):
    """20 rows of 8e11-dollar lineitems: per-row charge_scaled is
    ~8.1e17 (inside int64, so the per-row expression is well-defined on
    both engines) but the SUM is ~1.63e19 — past int64's 9.22e18."""
    price, disc, tax = 8.0e11, 0.05, 0.07
    n = 20
    true_sum = (int(price) * 100) * (100 - 5) * (100 + 7) * n
    assert true_sum > 2**63 - 1  # the scenario premise

    rows = [(price, disc, tax)] * n
    sdf = spark.createDataFrame(rows, _SCHEMA)
    # the BIGINT-path failure mode, demonstrated: under Spark 4's
    # default ANSI mode the accumulator overflow raises (loud query
    # error at the tier the headroom guard trips for) — it does NOT
    # produce a value at all
    import pytest

    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        sdf.select(F.sum(F.expr(CHARGE_SCALED)).alias("big")).collect()
    # the escape hatch: exact 38-digit arithmetic
    got = sdf.select(F.sum(F.expr(CHARGE_SCALED_DEC38)).alias("dec")).collect()[0]
    assert int(got["dec"]) == true_sum

    con = duckdb.connect()
    con.execute("CREATE TABLE g (l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
    dec_d = con.execute(f"SELECT sum({CHARGE_SCALED_DEC38}) FROM g").fetchone()[0]
    assert int(dec_d) == true_sum


def test_dec38_query_matches_bigint_query_on_fixture():
    """groupby_agg_dec38.sum_charge == groupby_agg.sum_charge per group
    on the active tier (both reconstitute from exact accumulators, so
    equality is exact, not approximate)."""
    con = duckdb.connect()
    path = os.path.join(SF_ORACLE, "lineitem.parquet")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{path}')")
    from rust_etl_spark.plans.catalog import oracle_sql

    sqls = oracle_sql()
    big = con.execute(
        f"SELECT l_returnflag, l_linestatus, sum_charge FROM ({sqls['groupby_agg']}) ORDER BY 1, 2"
    ).fetchall()
    dec = con.execute(
        f"SELECT l_returnflag, l_linestatus, sum_charge FROM ({sqls['groupby_agg_dec38']}) ORDER BY 1, 2"
    ).fetchall()
    assert big == dec
