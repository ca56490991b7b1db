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
