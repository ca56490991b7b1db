"""dedup_embedding_lsh plane-count sizing: the Python derivation
(``lsh_dedup_planes``) and the generated SQL scalar subquery
(``_LSH_DEDUP_PLANES_SQL``) must pick the SAME plane count P for every
corpus size — a desync would silently give Spark and the DuckDB oracle
different bucket keys (the fuzzy_block_len lesson, round 7 ADVICE).
The SQL VALUES rows are generated from the same constants; this test
pins the two derivations equal across every power-of-two boundary in
range, including the +/-1-row edges where an off-by-one in either side
would flip P.
"""

from __future__ import annotations

import duckdb
import pytest

from rust_etl_spark.operators.similarity import (
    _LSH_DEDUP_PLANES_SQL,
    _LSH_MAX_PLANES,
    LSH_DEDUP_OCCUPANCY,
    N_PLANES,
    lsh_dedup_planes,
)


def _sql_planes(n_vectors: int) -> int:
    """Evaluate the oracle's scalar subquery against a fake embeddings
    table of exactly n_vectors rows (the subquery only reads count(*))."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM range({n_vectors})")
    return con.execute(f"SELECT {_LSH_DEDUP_PLANES_SQL}").fetchone()[0]


#: every boundary N where P can change, plus +/-1 edges and the
#: graded/gen-tier corpus sizes actually in use.
BOUNDARIES = sorted(
    {
        n
        for p in range(N_PLANES, _LSH_MAX_PLANES + 1)
        for n in (
            (1 << p) * LSH_DEDUP_OCCUPANCY - 1,
            (1 << p) * LSH_DEDUP_OCCUPANCY,
            (1 << p) * LSH_DEDUP_OCCUPANCY + 1,
        )
    }
    | {1, 2_000, 20_000, 60_000, 200_000, 10**10}
)


@pytest.mark.parametrize("n_vectors", BOUNDARIES)
def test_python_and_sql_derivations_agree(n_vectors: int) -> None:
    assert lsh_dedup_planes(n_vectors) == _sql_planes(n_vectors)


def test_derivation_shape() -> None:
    # monotone non-decreasing in N, clamped to [N_PLANES, _LSH_MAX_PLANES]
    ps = [lsh_dedup_planes(n) for n in BOUNDARIES]
    assert ps == sorted(ps)
    assert ps[0] == N_PLANES
    assert ps[-1] == _LSH_MAX_PLANES
    # the occupancies the graded and gen tiers actually see: P = 8 at
    # every graded tier (bit-identical to the historical fixed key),
    # stepping only at the big gen tiers.
    assert lsh_dedup_planes(2_000) == 8       # sf0.1 graded tier
    assert lsh_dedup_planes(20_000) == 10     # gen_sf1 (10x)
    assert lsh_dedup_planes(60_000) == 11     # gen_sf3 (30x)
    assert lsh_dedup_planes(200_000) == 13    # gen_sf10 (100x)
    # bounded occupancy within range: expected bucket load never
    # exceeds the target once P has room to step.
    for n in (2_000, 20_000, 60_000, 200_000, 5_000_000):
        p = lsh_dedup_planes(n)
        if p < _LSH_MAX_PLANES:
            assert n / (1 << p) <= LSH_DEDUP_OCCUPANCY
