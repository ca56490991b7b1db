"""fuzzy_blocked_match block-key sizing: the Python derivation
(``fuzzy_block_len``) and the generated SQL scalar subquery
(``_FUZZY_BLK_SQL``) must pick the SAME suffix length L for every
corpus size — a desync would silently give Spark and the DuckDB
oracle different block keys (ADVICE round 7). The SQL VALUES rows are
generated from the same constants; this test pins the two derivations
equal across every power-of-ten boundary in range, including the
+/-1-row edges where an off-by-one in either side would flip L.
"""

from __future__ import annotations

import duckdb
import pytest

from rust_etl_spark.plans.advanced_agg import (
    _FUZZY_BLK_SQL,
    _FUZZY_MAX_LEN,
    FUZZY_BLOCK_DENSITY,
    fuzzy_block_len,
)


def _sql_block_len(n_rows: int) -> int:
    """Evaluate the oracle's scalar subquery against a fake customer
    table of exactly n_rows rows (the subquery only reads count(*))."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM range({n_rows})"
    )
    return con.execute(f"SELECT {_FUZZY_BLK_SQL}").fetchone()[0]


#: every boundary N where L can change, plus the +/-1 edges and the
#: graded/gen-tier corpus sizes actually in use.
BOUNDARIES = sorted(
    {
        n
        for length in range(3, _FUZZY_MAX_LEN + 1)
        for n in (
            10**length * FUZZY_BLOCK_DENSITY - 1,
            10**length * FUZZY_BLOCK_DENSITY,
            10**length * FUZZY_BLOCK_DENSITY + 1,
        )
    }
    | {1, 150, 15_000, 150_000, 450_000, 1_500_000, 10**9}
)


@pytest.mark.parametrize("n_rows", BOUNDARIES)
def test_python_and_sql_derivations_agree(n_rows: int) -> None:
    assert fuzzy_block_len(n_rows) == _sql_block_len(n_rows)


def test_derivation_shape() -> None:
    # monotone non-decreasing in N, clamped to [3, _FUZZY_MAX_LEN]
    lens = [fuzzy_block_len(n) for n in BOUNDARIES]
    assert lens == sorted(lens)
    assert lens[0] == 3
    assert lens[-1] == _FUZZY_MAX_LEN
    # the densities the graded and gen tiers actually see
    assert fuzzy_block_len(15_000) == 3  # sf0.1 graded tier
    assert fuzzy_block_len(150_000) == 4  # gen_sf1 (10x)
    assert fuzzy_block_len(450_000) == 4  # gen_sf3 (30x)
