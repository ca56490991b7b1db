"""Executable int64-headroom guard for the scaled-integer money/value
doctrine (round-14 VERDICT #2: "overflow is impossible-by-test, not
impossible-by-prose").

Past the headroom the BIGINT path FAILS: under Spark 4's default ANSI
mode sum(BIGINT) overflow raises ARITHMETIC_OVERFLOW (a loud query
error — pinned in tests/test_money_dec38.py; the silent wrap earlier
prose described is the non-ANSI behavior, which nothing in this repo
or the driver enables), while DuckDB promotes to HUGEINT and its CAST
AS BIGINT raises. This test measures the ACTUAL worst-case
accumulator — the max
|per-group sum| at each scale family's coarsest graded grain — ON THE
ACTIVE TIER (the sf0.1 parity sweep and the one-off gen_sf1/gen_sf10
sweeps re-run it at 10x/100x fixture scale) and fails while there is
still a 2x safety factor left, long before any query can fail.
Measured reference points: charge_scaled at q1's 4-group grain is
~18% of int64 at gen_sf10 and linear in rows-per-group, so this trips
near ~sf25 — before the ~sf50 overflow crossing documented in
functions/money.py. The escape hatch when a tier trips it is
IMPLEMENTED and oracle-verified: migrate the offending family's
accumulator to DECIMAL(38,0) via functions/money.py::dec38_sql —
groupby_agg_dec38 (plans/relational.py) is the live tested migration
of the widest family, tests/test_money_dec38.py pins its cross-engine
parity including a beyond-int64 sum, and DEC38_BENCH.json records the
measured cost.
"""

from __future__ import annotations

import os

import duckdb

from rust_etl_spark.functions.money import (
    CHARGE_SCALED,
    O_TOTALPRICE_CENTS,
    REV_SCALED,
    VALUE_CENTS,
)
from tests.conftest import SF_ORACLE

INT64_MAX = 2**63 - 1
#: fail while 2x headroom remains — loud well before wraparound.
HEADROOM_BOUND = INT64_MAX // 2

#: family -> (table, summand SQL, grouping). The grouping is the
#: COARSEST grain any graded query aggregates that summand at (fewest
#: groups = largest per-group sums); "1" means a global accumulator.
FAMILIES = {
    # q1 sums charge per (returnflag, linestatus) — 4 groups.
    "charge_scaled(1e-6 $)": ("lineitem", CHARGE_SCALED, "l_returnflag, l_linestatus"),
    # q6-shaped revenue is a single global accumulator.
    "rev_scaled(1e-4 $)": ("lineitem", REV_SCALED, "1"),
    "o_totalprice_cents": ("orders", O_TOTALPRICE_CENTS, "1"),
    "c_acctbal_cents": ("customer", f"abs(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))", "1"),
    "events_value_cents": ("events", VALUE_CENTS, "1"),
}


def _worst_group_sum(con, path: str, summand: str, grouping: str) -> int:
    # HUGEINT-safe on the DuckDB side; the measured value is the bound
    # we assert BIGINT-safe for the Spark side.
    group_by = "" if grouping == "1" else f" GROUP BY {grouping}"
    total = con.execute(
        f"SELECT max(abs(s)) FROM (SELECT sum({summand}) AS s "
        f"FROM read_parquet('{path}'){group_by})"
    ).fetchone()[0]
    return abs(int(total or 0))


def test_scaled_sums_stay_inside_int64_headroom():
    con = duckdb.connect()
    report = {}
    over = {}
    for name, (table, summand, grouping) in FAMILIES.items():
        path = os.path.join(SF_ORACLE, f"{table}.parquet")
        total = _worst_group_sum(con, path, summand, grouping)
        report[name] = f"{total:.3e} = {total / INT64_MAX:.2%} of int64"
        if total > HEADROOM_BOUND:
            over[name] = report[name]
    assert not over, (
        f"scaled-integer accumulators within 2x of int64 wraparound at {SF_ORACLE}: {over}. "
        "Spark's ANSI sum(BIGINT) raises ARITHMETIC_OVERFLOW here — migrate the "
        "family to DECIMAL(38,0) accumulators via functions/money.py::dec38_sql "
        "(tested migration: groupby_agg_dec38 + tests/test_money_dec38.py) before "
        "running this tier. Full report: " + repr(report)
    )


def test_twa_numerator_stays_inside_int64_headroom():
    """The widest events-family accumulator: time-weighted-average
    numerator sum(value_cents x dt_us) PER USER (its actual grain).
    Grows linearly with rows-per-user (money.py VALUE_CENTS note:
    2.4e-3 of int64 at sf0.1, ~0.24 only at ~sf1000)."""
    con = duckdb.connect()
    path = os.path.join(SF_ORACLE, "events.parquet")
    total = con.execute(
        f"""
        WITH t AS (
            SELECT user_id, {VALUE_CENTS} AS cents, epoch_us(ts) AS t_us,
                   lead(epoch_us(ts)) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id) AS nxt_us
            FROM read_parquet('{path}')
        )
        SELECT max(abs(s)) FROM (
            SELECT sum(cents * (nxt_us - t_us)) AS s
            FROM t WHERE nxt_us IS NOT NULL GROUP BY user_id)
        """
    ).fetchone()[0]
    total = abs(int(total or 0))
    assert total <= HEADROOM_BOUND, (
        f"twa numerator at {total / INT64_MAX:.2%} of int64 at {SF_ORACLE} — "
        "migrate events_time_weighted_avg to DECIMAL(38,0) accumulators via "
        "functions/money.py::dec38_sql (tested migration pattern: "
        "groupby_agg_dec38 + tests/test_money_dec38.py)"
    )
