"""Portable cross-engine rounding.

``round(double, n)`` is NOT portable on boundary values: Spark rounds
the shortest decimal string (BigDecimal HALF_UP — 0.49824999999999997
-> 0.4982), while DuckDB's runtime multiplies first (x * 1e4 lands on
exactly 4982.5 -> half-away -> 0.4983). Both raw doubles were
bit-identical; the round step alone diverged (12 of 3000 docs at
sf0.1 — invisible at the sf0.01 grading scale).

``round_half_up`` instead computes floor(x * 10^n + 0.5) / 10^n on
BOTH engines: every step is a correctly-rounded IEEE operation, so the
results are bit-identical whenever the inputs are. Intended for
non-negative scores (for negatives it rounds half toward +inf).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, ndigits: int) -> Column:
    s = float(10 ** ndigits)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def round_half_up_sql(expr: str, ndigits: int) -> str:
    s = float(10 ** ndigits)
    return f"floor(({expr}) * {s} + 0.5) / {s}"
