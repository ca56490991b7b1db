"""Unified property sweep over the integer scale-derivation family.

The repo's most distinctive invariant is that every scale-aware sizing
knob is an INTEGER-ONLY derivation computed identically by Spark-side
Python and the DuckDB oracle SQL (no log10 / float boundary risk). Six
members exist as of round 9 — `ivf_mod`, `ivf_n_cells` /
`ivf_super_factor` / `ivf_nprobe`, `lsh_dedup_planes`,
`fuzzy_block_len`, `late_block` — each individually boundary-pinned in
its own test file. This file is the FAMILY regression net (VERDICT r8
optional item, r9 #4): one parametrized sweep driving N across decades
(explicit boundaries of every derivation + seeded log-uniform randoms)
and asserting Python == the generated SQL mirror on DuckDB for each
mirrored member in a single round trip per N.

`late_block` has no SQL mirror BY DESIGN (the two-level prefix-max
decomposition is exact for any width, so the oracle states the naive
running max and never needs the block size); it is swept Python-side
against its defining properties instead, including the cap region the
DuckDB-backed sweep can't reach (count views above ~10^9 get slow).
"""

from __future__ import annotations

import duckdb
import pytest

from rust_etl_spark.operators.similarity import (
    _IVF_MAX_SUPER_FACTOR,
    _IVF_MOD_SQL,
    _IVF_N_CELLS_SQL,
    _IVF_NPROBE_SQL,
    _IVF_SUPER_FACTOR_SQL,
    _LSH_DEDUP_PLANES_SQL,
    _LSH_MAX_PLANES,
    IVF_HIER_MIN_CELLS,
    IVF_NPROBE,
    LSH_DEDUP_OCCUPANCY,
    N_PLANES,
    ivf_mod,
    ivf_n_cells,
    ivf_nprobe,
    ivf_super_factor,
    lsh_dedup_planes,
)
from rust_etl_spark.plans.advanced_agg import (
    _FUZZY_BLK_SQL,
    _FUZZY_MAX_LEN,
    FUZZY_BLOCK_DENSITY,
    fuzzy_block_len,
)
from rust_etl_spark.plans.events_queries import LATE_BLOCK, late_block


def _sweep_ns() -> list[int]:
    """Decade walls, every derivation's own thresholds (+/-1), and
    seeded log-uniform randoms — deterministic across runs."""
    import random

    ns: set[int] = set()
    # decade boundaries across the DuckDB-feasible span
    for d in range(0, 10):
        for off in (-1, 0, 1):
            ns.add(10**d + off)
    # ivf_mod thresholds: mod steps where mod*mod < n first holds
    for mod2 in (10**4, 10**6, 10**8):
        ns.update({mod2 - 1, mod2, mod2 + 1})
    # lsh_dedup_planes thresholds: (1 << p) * occupancy
    for p in (N_PLANES, 10, 14, 20, _LSH_MAX_PLANES):
        t = (1 << p) * LSH_DEDUP_OCCUPANCY
        ns.update({t - 1, t, t + 1})
    # fuzzy_block_len thresholds: 10^L * density
    for ln in range(3, _FUZZY_MAX_LEN + 1):
        t = (10**ln) * FUZZY_BLOCK_DENSITY
        ns.update({t - 1, t, t + 1})
    # hierarchy gate: cells == IVF_HIER_MIN_CELLS at mod 100
    gate = (IVF_HIER_MIN_CELLS - 1) * 100
    ns.update({gate, gate + 1, gate + 100, gate + 101})
    # super-factor steps at mod 100: f*f < cells boundaries (f=8,16,32)
    for f in (8, 16, 32):
        cells_t = f * f
        ns.update({cells_t * 100, cells_t * 100 + 1})
    # seeded log-uniform randoms across the whole span
    rng = random.Random(42)
    for _ in range(20):
        ns.add(rng.randrange(1, 10**9))
    return sorted(n for n in ns if 1 <= n <= 2 * 10**9)


_NS = _sweep_ns()


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.parametrize("n", _NS)
def test_python_matches_sql_mirror(con, n):
    """One DuckDB round trip evaluates every mirrored derivation at N;
    each must equal its Python twin exactly."""
    con.execute(f"CREATE OR REPLACE VIEW embeddings AS SELECT range AS vec_id FROM range({n})")
    con.execute(f"CREATE OR REPLACE VIEW customer AS SELECT range AS c_custkey FROM range({n})")
    row = con.execute(
        f"SELECT {_IVF_MOD_SQL} AS mod, {_IVF_N_CELLS_SQL} AS cells, "
        f"{_IVF_SUPER_FACTOR_SQL} AS f, {_IVF_NPROBE_SQL} AS np, "
        f"{_LSH_DEDUP_PLANES_SQL} AS planes, {_FUZZY_BLK_SQL} AS blk"
    ).fetchone()
    sql_mod, sql_cells, sql_f, sql_np, sql_planes, sql_blk = (int(v) for v in row)
    mod = ivf_mod(n)
    cells = ivf_n_cells(n, mod)
    assert sql_mod == mod, f"ivf_mod desync at n={n}"
    assert sql_cells == cells, f"ivf_n_cells desync at n={n}"
    assert sql_f == ivf_super_factor(cells), f"ivf_super_factor desync at n={n}"
    assert sql_np == ivf_nprobe(cells), f"ivf_nprobe desync at n={n}"
    assert sql_planes == lsh_dedup_planes(n), f"lsh_dedup_planes desync at n={n}"
    assert sql_blk == fuzzy_block_len(n), f"fuzzy_block_len desync at n={n}"


@pytest.mark.parametrize("n", _NS + [10**12, 10**12 + 1, 10**13, 10**15])
def test_family_properties(n):
    """Derivation-defining properties, Python-side — includes the cap
    regions (N > 10^12) the DuckDB count view can't reach cheaply."""
    mod = ivf_mod(n)
    assert mod in {10**k for k in range(2, 7)}
    assert mod * mod >= n or mod == 10**6  # covers, or capped
    if mod > 100:
        assert (mod // 10) ** 2 < n  # minimal
    cells = ivf_n_cells(n, mod)
    assert cells == (n - 1) // mod + 1
    f = ivf_super_factor(cells)
    if cells < IVF_HIER_MIN_CELLS:
        assert f == 1
    else:
        assert f >= 8 and (f & (f - 1)) == 0  # power of 2
        assert f * f >= cells or f == _IVF_MAX_SUPER_FACTOR
        if f > 8:
            assert (f // 2) ** 2 < cells
    np_ = ivf_nprobe(cells)
    assert np_ == max(IVF_NPROBE, (cells + 4) // 5)
    assert 5 * np_ >= cells  # probed fraction >= 1/5
    p = lsh_dedup_planes(n)
    assert N_PLANES <= p <= _LSH_MAX_PLANES
    assert (1 << p) * LSH_DEDUP_OCCUPANCY >= n or p == _LSH_MAX_PLANES
    if p > N_PLANES:
        assert (1 << (p - 1)) * LSH_DEDUP_OCCUPANCY < n
    blk = fuzzy_block_len(n)
    assert 3 <= blk <= _FUZZY_MAX_LEN
    assert (10**blk) * FUZZY_BLOCK_DENSITY >= n or blk == _FUZZY_MAX_LEN
    if blk > 3:
        assert (10 ** (blk - 1)) * FUZZY_BLOCK_DENSITY < n
    # late_block: exactness of the decomposition is width-independent
    # (hence no SQL mirror); sweep its sizing properties here.
    w = late_block(n)
    assert w >= LATE_BLOCK and w <= 10**9
    s = w
    while s % 10 == 0:
        s //= 10
    assert s == 1  # power of 10
    assert w * w >= n or w == 10**9
    if w > LATE_BLOCK:
        assert (w // 10) ** 2 < n  # minimal
