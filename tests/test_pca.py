"""embedding_pca_project vs an independent numpy eigendecomposition.

The operator is rows-only in the catalog (driver-side direct
eigendecomposition via eigh — no SQL mirror), so this is its correctness gate: covariance, principal
axis, and per-vector projections must all agree with numpy computed
from the raw parquet, up to the sign convention and float tolerance.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from rust_etl_spark.operators.pca import (
    corpus_covariance,
    embedding_pca_project,
    top_eigenvector,
)
from rust_etl_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def xs() -> np.ndarray:
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    return np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)


def test_covariance_matches_numpy(spark, xs):
    emb = load_table(spark, SF, "embeddings")
    mu, cov, n = corpus_covariance(emb)
    assert n == len(xs)
    np.testing.assert_allclose(mu, xs.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(xs, rowvar=False, bias=True), rtol=1e-8, atol=1e-12)


def test_top_eigenvector_is_principal_axis(xs):
    cov = np.cov(xs, rowvar=False, bias=True)
    v = np.array(top_eigenvector(cov.tolist()))
    evals, evecs = np.linalg.eigh(cov)
    # same axis up to sign, Rayleigh quotient at the top eigenvalue
    assert abs(abs(v @ evecs[:, -1]) - 1.0) < 1e-8
    assert v @ cov @ v == pytest.approx(evals[-1], rel=1e-10)
    assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-12)


def test_projection_matches_numpy(spark, xs):
    rows = embedding_pca_project(spark, SF).orderBy("vec_id").collect()
    mu = xs.mean(axis=0)
    cov = np.cov(xs, rowvar=False, bias=True)
    _, evecs = np.linalg.eigh(cov)
    ref = evecs[:, -1]
    got = np.array([r["pc1"] for r in rows])
    want = (xs - mu) @ ref
    # operator sign convention: first nonzero component positive
    for x in ref:
        if x != 0.0:
            if x < 0.0:
                want = -want
            break
    np.testing.assert_allclose(got, np.round(want, 4), atol=2e-4)
    # the projection must actually separate the corpus (non-degenerate)
    assert got.std() > 0.1
