"""Hierarchical-path (f > 1) IVF oracle parity on a committed fixture.

The fixture tiers all sit below the hierarchy gate (f = 1 up to 30x),
so without this test the two-level assignment's Spark==DuckDB parity
would only ever be exercised against the gitignored gen tiers (it was
hash-verified at gen_sf10 manually in round 9). This builds a
deterministic synthetic embeddings corpus JUST over the gate (6,400
vectors -> mod 100 -> 64 cells -> super factor 8) in tmp storage and
runs the registered ivf_assign / kmeans_iterate / similarity_ann_ivf
queries against their own oracles on it — the driver-strict compare,
with the hierarchy ACTIVE on both engines.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rust_etl_spark.operators.similarity import (
    ivf_mod,
    ivf_n_cells,
    ivf_super_factor,
)
from rust_etl_spark.plans import catalog
from tests.oracle_harness import compare

N = 6_400  # smallest decade shape over the gate: 64 cells, f = 8
DIMS = 64


@pytest.fixture(scope="module")
def hier_sf_dir(tmp_path_factory) -> str:
    rng = np.random.default_rng(9)
    # mildly clustered so assignments aren't all ties: cluster centers
    # + noise, float32 like the real fixture
    centers = rng.normal(size=(20, DIMS))
    X = (centers[rng.integers(0, 20, N)] + 0.3 * rng.normal(size=(N, DIMS))).astype(
        np.float32
    )
    d = str(tmp_path_factory.mktemp("hier_sf"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N), pa.int64()),
                "embedding": pa.array([row for row in X.tolist()], pa.list_(pa.float32())),
                "label": pa.array([i % 5 for i in range(N)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


def test_gate_is_active_at_fixture_size():
    mod = ivf_mod(N)
    assert mod == 100
    cells = ivf_n_cells(N, mod)
    assert cells == 64
    assert ivf_super_factor(cells) == 8  # hierarchy ON


@pytest.mark.parametrize(
    "name", ["ivf_assign", "kmeans_iterate", "similarity_ann_ivf"]
)
def test_hierarchical_oracle_parity(spark, hier_sf_dir, name):
    con = duckdb.connect()
    path = os.path.join(hier_sf_dir, "embeddings.parquet")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    q = catalog.get(name)
    oracle = con.execute(q.oracle).fetchdf()
    assert len(oracle) > 0
    errs = compare(q.fn(spark, hier_sf_dir), oracle)
    assert not errs, errs


@pytest.fixture(scope="module")
def dup_super_sf_dir(tmp_path_factory) -> str:
    """Corpus where two SUPER centroids share an identical vector.

    vec_ids 0 and 800 are both supers at this shape (mod 100, super
    step 800); making them bit-identical means centroid 800 attaches
    to super 0 (lower-id tie-break), leaving super 800 with an EMPTY
    child set — the childless-super structure the assignment's kid
    joins must survive. Both engines tie-break (dist, id) ascending,
    so no vector's TOP-1 super is ever the higher-id duplicate, but an
    inner `kids` join would still be one refactor away from dropping
    rows; this fixture pins totality + oracle parity on the exact
    structure (ADVICE round 9)."""
    rng = np.random.default_rng(10)
    centers = rng.normal(size=(20, DIMS))
    X = (centers[rng.integers(0, 20, N)] + 0.3 * rng.normal(size=(N, DIMS))).astype(
        np.float32
    )
    X[800] = X[0]  # duplicate supers -> super 800 childless
    d = str(tmp_path_factory.mktemp("dup_super_sf"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N), pa.int64()),
                "embedding": pa.array([row for row in X.tolist()], pa.list_(pa.float32())),
                "label": pa.array([i % 5 for i in range(N)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


def test_childless_super_totality_and_parity(spark, dup_super_sf_dir):
    q = catalog.get("ivf_assign")
    res = q.fn(spark, dup_super_sf_dir)
    got = res.toPandas()
    # totality: no vector silently dropped by the childless super
    assert len(got) == N
    assert got["vec_id"].nunique() == N
    con = duckdb.connect()
    path = os.path.join(dup_super_sf_dir, "embeddings.parquet")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    oracle = con.execute(q.oracle).fetchdf()
    errs = compare(res, oracle)
    assert not errs, errs
