"""Measured recall characterization of the ANN tiers (CATALOG.md
appendix numbers).

Ground truth is an exact numpy scan over the raw parquet; candidates
and codes come from the SHIPPED Spark operators (collected once), so
the numbers characterize the actual engine output, not a reimplementation.

The synthetic embedding corpus is near-isotropic (uniform-ish random
vectors) — the adversarial case for every locality structure, since
true neighbors are barely closer than random ones. Single-probe
recall is therefore intentionally low here and documented as such;
the production-shaped two-stage PQ query (ADC shortlist -> exact
re-rank, the shipped `similarity_ann_pq`) is the one whose recall
this suite floors. Real embedding corpora (clustered) sit well above
these worst-case numbers.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from rust_etl_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    PQ_SHORTLIST,
    PQ_SUBDIM,
    embedding_pq_encode,
)

SF = "/root/testdata/sf0.001"
N_QUERIES = 50
K = 10

#: Measured on the shipped operating point (see module docstring for
#: why the floor is conservative): ADC shortlist-50 + exact re-rank
#: measured 0.564 mean recall@10 over 50 queries on the isotropic
#: fixture; shortlist-100 measured 0.764. Floors leave noise margin.
RERANK_RECALL_FLOOR = 0.45


@pytest.fixture(scope="module")
def corpus(spark):
    X = np.stack(
        pq.read_table(f"{SF}/embeddings.parquet").column("embedding").to_pylist()
    ).astype(np.float64)
    rows = embedding_pq_encode(spark, SF).collect()
    codes = {r["vec_id"]: [r[f"c{m}"] for m in range(PQ_M)] for r in rows}
    C = np.array([codes[i] for i in range(len(X))])
    return X, C


def _adc(X: np.ndarray, C: np.ndarray, q: int) -> np.ndarray:
    A = X[:PQ_K]
    grid = np.array(
        [
            [
                (
                    (
                        X[q][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                        - A[k][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                    )
                    ** 2
                ).sum()
                for k in range(PQ_K)
            ]
            for m in range(PQ_M)
        ]
    )
    adc = grid[np.arange(PQ_M), C].sum(axis=1)
    adc[q] = np.inf
    return adc


def _recall_at_shortlist(X, C, shortlist: int) -> float:
    rec = []
    for q in range(N_QUERIES):
        l2 = ((X - X[q]) ** 2).sum(axis=1)
        l2[q] = np.inf
        exact = set(np.argsort(l2, kind="stable")[:K])
        short = set(np.argsort(_adc(X, C, q), kind="stable")[:shortlist])
        rec.append(len(exact & short) / K)
    return float(np.mean(rec))


def test_pq_rerank_recall_floor(corpus):
    """The shipped two-stage query's recall: exact top-10 recovered by
    the ADC shortlist (re-ranking cannot lose members, so shortlist
    containment IS the two-stage recall)."""
    X, C = corpus
    r = _recall_at_shortlist(X, C, PQ_SHORTLIST)
    assert r >= RERANK_RECALL_FLOOR, f"shortlist-{PQ_SHORTLIST} recall {r:.3f}"


def test_pq_recall_grows_with_shortlist(corpus):
    """The ADC ordering must be informative: widening the shortlist
    must raise recall substantially (it would stay flat if ADC were
    noise), and the curve must be monotone."""
    X, C = corpus
    r10 = _recall_at_shortlist(X, C, 10)
    r50 = _recall_at_shortlist(X, C, 50)
    r100 = _recall_at_shortlist(X, C, 100)
    assert r10 <= r50 <= r100
    assert r100 >= r10 + 0.3, f"curve too flat: {r10:.3f} -> {r100:.3f}"
    # and far better than a random shortlist of the same size
    n = len(X)
    assert r50 > 50 / n * 3, "ADC shortlist no better than random"


def test_pq_codes_quantize_consistently(corpus):
    """Every anchor must encode to itself in every subspace (distance
    zero to its own codebook entry) — the encoder's fixed point."""
    X, C = corpus
    for k in range(PQ_K):
        assert list(C[k]) == [k] * PQ_M
