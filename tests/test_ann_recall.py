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

import os

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


@pytest.fixture(scope="module")
def probe_structures(spark):
    from rust_etl_spark.operators.similarity import ivf_assignments, lsh_buckets
    from rust_etl_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    buckets = {r["vec_id"]: r["bucket"] for r in lsh_buckets(spark, emb).collect()}
    cells = {r["vec_id"]: r["cid"] for r in ivf_assignments(spark, emb).collect()}
    return buckets, cells


def test_lsh_multiprobe_beats_random_scanning(corpus, probe_structures):
    """Hyperplane LSH on an isotropic corpus is the weakest tier by
    design (documented in CATALOG.md) — but its probe set must still
    be informative: recall per scanned fraction >= 2x random."""
    from rust_etl_spark.operators.similarity import N_PLANES

    X, _ = corpus
    buckets, _ = probe_structures
    n = len(X)
    norms = X / np.linalg.norm(X, axis=1, keepdims=True)
    recs, fracs = [], []
    for q in range(N_QUERIES):
        cos = norms @ norms[q]
        cos[q] = -np.inf
        exact = set(np.argsort(-cos, kind="stable")[:K])
        probe = {buckets[q]} | {buckets[q] ^ (1 << i) for i in range(N_PLANES)}
        cand = [i for i in range(n) if i != q and buckets[i] in probe]
        fracs.append(len(cand) / n)
        top = sorted(cand, key=lambda i: (-cos[i], i))[:K]
        recs.append(len(exact & set(top)) / K)
    assert np.mean(recs) >= 2 * np.mean(fracs), (
        f"recall {np.mean(recs):.3f} vs scanned {np.mean(fracs):.3f}"
    )


def test_ivf_nprobe_recall_floor(corpus, probe_structures):
    """nprobe=4 must recover most exact neighbors. NOTE: at sf0.001
    the corpus has only 5 cells (500 vecs / mod 100), so 4 probes scan
    ~80% — the floor mostly certifies that the per-cell exact rescore
    and the cell ranking are sound; cell counts grow with the corpus
    while nprobe stays fixed."""
    from rust_etl_spark.operators.similarity import IVF_NPROBE, ivf_mod

    X, _ = corpus
    _, cells = probe_structures
    n = len(X)
    cent_ids = [i for i in range(n) if i % ivf_mod(n) == 0]
    norms = X / np.linalg.norm(X, axis=1, keepdims=True)
    recs = []
    for q in range(N_QUERIES):
        cos = norms @ norms[q]
        cos[q] = -np.inf
        exact = set(np.argsort(-cos, kind="stable")[:K])
        d = sorted((float(((X[c] - X[q]) ** 2).sum()), c) for c in cent_ids)
        near = {c for _, c in d[:IVF_NPROBE]}
        cand = [i for i in range(n) if i != q and cells[i] in near]
        top = sorted(cand, key=lambda i: (-cos[i], i))[:K]
        recs.append(len(exact & set(top)) / K)
    assert np.mean(recs) >= 0.8, f"ivf nprobe recall {np.mean(recs):.3f}"


def test_ivf_recall_curve_monotone(corpus, probe_structures):
    """recall@10 as a function of nprobe (the knob), measured with the
    SHIPPED cell assignments — the CATALOG.md appendix curve. More
    probes may never hurt; the shipped point must sit on the curve."""
    from rust_etl_spark.operators.similarity import IVF_NPROBE, ivf_mod

    X, _ = corpus
    _, cells = probe_structures
    n = len(X)
    cent_ids = [i for i in range(n) if i % ivf_mod(n) == 0]
    norms = X / np.linalg.norm(X, axis=1, keepdims=True)
    curve = {}
    for nprobe in range(1, len(cent_ids) + 1):
        recs = []
        for q in range(N_QUERIES):
            cos = norms @ norms[q]
            cos[q] = -np.inf
            exact = set(np.argsort(-cos, kind="stable")[:K])
            d = sorted((float(((X[c] - X[q]) ** 2).sum()), c) for c in cent_ids)
            near = {c for _, c in d[:nprobe]}
            cand = [i for i in range(n) if i != q and cells[i] in near]
            top = sorted(cand, key=lambda i: (-cos[i], i))[:K]
            recs.append(len(exact & set(top)) / K)
        curve[nprobe] = round(float(np.mean(recs)), 3)
    print("IVF_RECALL_CURVE", curve)
    vals = [curve[p] for p in sorted(curve)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), curve
    assert curve[len(cent_ids)] == 1.0, "all cells probed == exact scan"
    assert curve[IVF_NPROBE] >= 0.8


def test_lsh_recall_curve_by_probe_radius(corpus, probe_structures):
    """recall@10 and scanned fraction at probe radius 0 (own bucket)
    and 1 (shipped: own + 8 one-flip buckets) — the CATALOG.md
    appendix curve for the LSH tier."""
    from rust_etl_spark.operators.similarity import N_PLANES

    X, _ = corpus
    buckets, _ = probe_structures
    n = len(X)
    norms = X / np.linalg.norm(X, axis=1, keepdims=True)
    curve = {}
    for radius in (0, 1):
        recs, fracs = [], []
        for q in range(N_QUERIES):
            cos = norms @ norms[q]
            cos[q] = -np.inf
            exact = set(np.argsort(-cos, kind="stable")[:K])
            probe = {buckets[q]}
            if radius >= 1:
                probe |= {buckets[q] ^ (1 << i) for i in range(N_PLANES)}
            cand = [i for i in range(n) if i != q and buckets[i] in probe]
            fracs.append(len(cand) / n)
            top = sorted(cand, key=lambda i: (-cos[i], i))[:K]
            recs.append(len(exact & set(top)) / K)
        curve[radius] = (
            round(float(np.mean(recs)), 3),
            round(float(np.mean(fracs)), 3),
        )
    print("LSH_RECALL_CURVE", curve)
    (r0, f0), (r1, f1) = curve[0], curve[1]
    assert r1 >= r0 and f1 > f0
    assert r1 >= 2 * f1, "probe set must stay informative vs random"


# ------------------------------------------------- tier-gated recall
# (VERDICT r6 #3 / r7 #3): the sqrt(N) IVF codebook decade-jumps MOD
# with corpus size, so recall where the cell count/size actually
# changes must be MEASURED, not asserted by construction. These run at
# whatever tier SPARK_GRAFT_TEST_SF_DIR points to (the sf0.1 parity
# sweep exercises the 20-cell codebook; point it at gen_sf1 for the
# post-decade-jump 10x tier, MOD=1000) and are skipped at the sf0.001
# default where the module-level tests already cover the 5-cell case.

TIER_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "")
_TIER_GATE = pytest.mark.skipif(
    not TIER_SF or TIER_SF.rstrip("/").endswith("sf0.001"),
    reason="tier recall runs under SPARK_GRAFT_TEST_SF_DIR at >= sf0.1",
)


@_TIER_GATE
def test_tier_ivf_recall_curve(spark):
    """IVF recall@10 vs nprobe at the gated tier, shipped cells, exact
    ground truth over the full corpus (sampled queries): monotone,
    exact when all cells probed, informative vs random scanning, and
    floored at the shipped nprobe."""
    from scripts.ann_recall_tier import ivf_recall_curve, load_corpus
    from rust_etl_spark.operators.similarity import (
        IVF_NPROBE,
        ivf_mod,
        ivf_n_cells,
        ivf_nprobe,
    )

    X = load_corpus(TIER_SF)
    np_default = ivf_nprobe(ivf_n_cells(len(X), ivf_mod(len(X))))
    curve, n_cells = ivf_recall_curve(
        spark, TIER_SF, X, sorted({1, 2, IVF_NPROBE, 8, 16, np_default})
    )
    print("TIER_IVF_RECALL", TIER_SF, "cells", n_cells, "default", np_default, curve)
    vals = [curve[p] for p in sorted(curve)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), curve
    if 16 >= n_cells:
        assert curve[16] == 1.0, "all cells probed == exact scan"
    # informativeness: the probed fraction of an isotropic corpus is
    # ~nprobe/n_cells; recall must beat random scanning clearly.
    scanned = IVF_NPROBE / n_cells
    assert curve[IVF_NPROBE] >= 1.3 * scanned, (curve, n_cells)
    # measured floor (round 8, noise margin left): sf0.1 measured
    # 0.448 (20 cells, nprobe4 = 20% scanned — 2.2x random on the
    # isotropic fixture) and gen_sf1 0.642 (20 cells of 1000 after the
    # MOD 100->1000 decade jump; the gen tier's replica-sibling
    # clusters make locality EASIER there, see ANN_RECALL_gen_sf1.json).
    assert curve[IVF_NPROBE] >= 0.35, curve
    # the SCALE-AWARE default (round 9: ivf_nprobe holds the probed
    # fraction at >= 1/5 of the cells) must hold recall at or above the
    # sf0.1 20%-fraction anchor at EVERY tier — the round-8 dilution
    # (fixed nprobe=16: 0.958 -> 0.732 as cells grew 20 -> 200) is what
    # this derivation exists to prevent. Measured round 9: sf0.1 0.448,
    # gen_sf1 0.642, gen_sf3 0.800, gen_sf10 0.832 (ANN_RECALL_*.json;
    # the big tiers IMPROVE on the anchor because 20% of more, smaller
    # cells is a sharper probe set — and that holds even with the
    # round-9 top-2-super hierarchical assignment active at 100x).
    assert curve[np_default] >= 0.40, (np_default, curve)


@_TIER_GATE
def test_tier_pq_rerank_recall_curve(spark):
    """Two-stage PQ recall@10 vs ADC shortlist at the gated tier,
    shipped codes: monotone-growing and floored at the shipped
    shortlist."""
    from scripts.ann_recall_tier import pq_recall_curve, load_corpus

    X = load_corpus(TIER_SF)
    curve = pq_recall_curve(spark, TIER_SF, X, [10, PQ_SHORTLIST, 100, 200])
    print("TIER_PQ_RECALL", TIER_SF, curve)
    vals = [curve[s] for s in sorted(curve)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), curve
    assert curve[200] >= curve[10] + 0.1, f"ADC ordering uninformative: {curve}"
    # measured floor (round 8): sf0.1 0.340, gen_sf1 0.532 at shortlist
    # 50. The FIXED shortlist over a growing corpus shrinks the
    # shortlisted fraction linearly (50/2000 = 2.5% -> 50/20000 =
    # 0.25%), so recall-per-scanned-fraction RISES 13x -> 200x+ over
    # random — the ADC ordering stays sharply informative; scale the
    # shortlist with N to hold absolute recall (CATALOG.md documents
    # the knob). Floor is conservative for isotropic worst-case tiers.
    assert curve[PQ_SHORTLIST] >= 0.15, curve
