"""Direct cross-engine lock for functions/money.py (round 13).

The 21-query scaled-integer migration rests on one claim: the
quantization expression text evaluates BIT-IDENTICALLY on Spark and
DuckDB for any double input, because every step (multiply, add,
floor, int cast) is a correctly-rounded IEEE op. The oracle-parity
suite exercises it through whole queries on fixture data; this test
pins the primitive itself on a hand-picked adversarial grid —
including the values where the old round(x*100, 0) form was only
EMPIRICALLY portable (Spark rounds the decimal string via
BigDecimal, DuckDB multiplies) and the negative amounts where the
tie rule is half-toward-+inf by convention.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rust_etl_spark.functions.money import cents_sql, pct_sql

#: the adversarial grid: 2-decimal money (stored slightly below/above
#: the integer-cents point), sub-cent strays, exact-half candidates
#: (x*100 lands within an ulp of n+0.5 — the round() divergence zone),
#: negatives (tie half-toward-+inf), zero, and large magnitudes.
VALUES = [
    0.0,
    0.01,
    0.05,
    1234.56,
    999999.99,
    104949.5049,
    1.005,
    2.675,  # classic: 2.675*100 = 267.49999999999997
    0.125,
    0.985,
    -1.005,
    -2.675,
    -999.99,
    -0.005,
    55000.004999999997,
    170286033.175,  # the round-6 q9 half-cent boundary sum, as a raw value
    0.045,
    0.075,
    0.08,
]


@pytest.mark.parametrize("expr_fn", [cents_sql, pct_sql], ids=["cents", "pct"])
def test_quantization_matches_duckdb_exactly(spark, expr_fn):
    expr = expr_fn("x")
    sdf = spark.createDataFrame([(v,) for v in VALUES], "x double")
    spark_out = [r[0] for r in sdf.select(F.expr(expr).alias("q")).collect()]

    con = duckdb.connect()
    duck_out = [
        con.execute(f"SELECT {expr} FROM (SELECT CAST(? AS DOUBLE) AS x)", [v]).fetchone()[0]
        for v in VALUES
    ]
    assert spark_out == duck_out, list(zip(VALUES, spark_out, duck_out))
    # every output is an exact integer (BIGINT on both engines)
    assert all(isinstance(v, int) for v in spark_out)


def test_2dp_money_quantizes_to_true_cents(spark):
    """For well-formed 2-decimal money the half-up floor recovers the
    TRUE cents value — including values whose double representation
    sits just below the integer point, where a bare floor(x*100)
    truncates one low (the customer_ltv_deciles bug fixed in r13)."""
    # 0.29/0.57/1.13 store just BELOW n/100 (floor(x*100) reads 28/56/112)
    cases = [(0.29, 29), (0.57, 57), (1.13, 113), (1234.56, 123456), (-999.99, -99999)]
    sdf = spark.createDataFrame([(v,) for v, _ in cases], "x double")
    got = [r[0] for r in sdf.select(F.expr(cents_sql("x")).alias("q")).collect()]
    assert got == [c for _, c in cases]
    # the truncating form really does differ on these inputs (guards
    # against someone "simplifying" the +0.5 away)
    trunc = [r[0] for r in sdf.select(F.expr("CAST(floor(x * 100) AS BIGINT)").alias("q")).collect()]
    assert trunc != got

def test_qty_int_floor_form_matches_duckdb_exactly(spark):
    """QTY_INT portability (round-14 ADVICE): a bare CAST(x AS BIGINT)
    truncates toward zero on Spark but rounds half-even on DuckDB for
    non-integral doubles — the floor(x + 0.5) form agrees on BOTH the
    fixture-invariant whole numbers and adversarial non-integrals, so
    a future fixture change degrades loudly in the parity sweep rather
    than silently diverging."""
    from rust_etl_spark.functions.money import QTY_INT

    values = [0.0, 1.0, 7.0, 50.0, 2.5, 3.5, -2.5, 0.49999999999999994, 1.13, 49.999999999999996]
    expr = QTY_INT.replace("l_quantity", "x")
    sdf = spark.createDataFrame([(v,) for v in values], "x double")
    spark_out = [r[0] for r in sdf.select(F.expr(expr).alias("q")).collect()]
    con = duckdb.connect()
    duck_out = [
        con.execute(f"SELECT {expr} FROM (SELECT CAST(? AS DOUBLE) AS x)", [v]).fetchone()[0]
        for v in values
    ]
    assert spark_out == duck_out, list(zip(values, spark_out, duck_out))


def test_fixture_quantization_invariants():
    """The invariants the scaled-integer doctrine rests on, pinned on
    the ACTIVE tier (the sf0.1 sweep re-runs this where boundary values
    actually occur): l_quantity is whole-number, and every money-class
    column — l_extendedprice, o_totalprice, c_acctbal, events.value —
    is generator-quantized to exactly 2 decimals."""
    import os

    import duckdb as _duck

    from tests.conftest import SF_ORACLE

    con = _duck.connect()
    checks = {
        "lineitem/l_quantity integral": (
            "lineitem", "sum(CASE WHEN l_quantity <> floor(l_quantity) THEN 1 ELSE 0 END)"),
        "lineitem/l_extendedprice 2dp": (
            "lineitem", "sum(CASE WHEN abs(l_extendedprice*100 - round(l_extendedprice*100)) > 1e-6 THEN 1 ELSE 0 END)"),
        "orders/o_totalprice 2dp": (
            "orders", "sum(CASE WHEN abs(o_totalprice*100 - round(o_totalprice*100)) > 1e-6 THEN 1 ELSE 0 END)"),
        "customer/c_acctbal 2dp": (
            "customer", "sum(CASE WHEN abs(c_acctbal*100 - round(c_acctbal*100)) > 1e-6 THEN 1 ELSE 0 END)"),
        "events/value 2dp": (
            "events", "sum(CASE WHEN abs(value*100 - round(value*100)) > 1e-6 THEN 1 ELSE 0 END)"),
    }
    bad = {}
    for name, (table, expr) in checks.items():
        path = os.path.join(SF_ORACLE, f"{table}.parquet")
        n = con.execute(f"SELECT {expr} FROM read_parquet('{path}')").fetchone()[0]
        if n:
            bad[name] = int(n)
    assert not bad, (
        f"fixture quantization invariants violated at {SF_ORACLE}: {bad} — "
        "the scaled-integer oracles (functions/money.py) are only value-exact "
        "on quantized inputs; re-derive the offending expressions before trusting parity"
    )
