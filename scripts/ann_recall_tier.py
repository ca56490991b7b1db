"""ANN recall measured at an arbitrary fixture tier (VERDICT r6 #3 /
r7 #3: the sqrt(N) IVF codebook decade-jumps its centroid count with
corpus size — sf0.001's 5-cell curve says nothing about the tier where
MOD actually steps 100 -> 1000, so measure recall THERE).

Ground truth is an exact numpy scan over the full corpus (sampled
queries); cells and PQ codes come from the SHIPPED Spark operators
(`ivf_assignments`, `embedding_pq_encode`), so the curves characterize
engine output, not a reimplementation. Metrics match each operator's
scoring: IVF ranks cells by centroid L2 and rescores by exact cosine
(recall vs exact cosine top-k); PQ shortlists by ADC and re-ranks by
exact L2 (recall vs exact L2 top-k; re-rank cannot lose shortlist
members, so shortlist containment IS two-stage recall).

Run:  python scripts/ann_recall_tier.py [sf_dir ...]
      (default: sf0.1 and gen_sf1) — writes ANN_RECALL_<tier>.json;
      the CATALOG.md appendix table is updated from these numbers.
The same measurement functions back the tier-gated pytest
(tests/test_ann_recall.py::test_tier_*, run under
SPARK_GRAFT_TEST_SF_DIR).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_etl_spark.operators.similarity import (  # noqa: E402
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    embedding_pq_encode,
    ivf_assignments,
    ivf_mod,
    ivf_n_cells,
    ivf_nprobe,
)

N_QUERIES = 50
K = 10


def load_corpus(sf_dir: str) -> np.ndarray:
    X = np.stack(
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        .column("embedding")
        .to_pylist()
    ).astype(np.float64)
    return X


def query_sample(n: int, n_queries: int = N_QUERIES) -> np.ndarray:
    """Deterministic evenly-spaced query vec_ids (vec_id == row index
    in the fixtures)."""
    return np.unique(np.linspace(0, n - 1, n_queries).astype(int))


def ivf_recall_curve(
    spark, sf_dir: str, X: np.ndarray, nprobes: list[int]
) -> tuple[dict[int, float], int]:
    """Mean recall@K per nprobe, using the SHIPPED cell assignment;
    returns (curve, n_cells)."""
    from rust_etl_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mod = ivf_mod(len(X))
    cid_of = np.empty(len(X), dtype=np.int64)
    for r in ivf_assignments(spark, emb, mod, len(X)).collect():
        cid_of[r["vec_id"]] = r["cid"]
    cents = np.array([i for i in range(len(X)) if i % mod == 0])
    Xc = X[cents]
    norms = X / np.linalg.norm(X, axis=1, keepdims=True)

    curve: dict[int, float] = {p: [] for p in nprobes}
    for q in query_sample(len(X)):
        cos = norms @ norms[q]
        cos[q] = -np.inf
        exact = set(np.argsort(-cos, kind="stable")[:K])
        # cells ranked by centroid L2 to the query (the shipped plan)
        cd = ((Xc - X[q]) ** 2).sum(axis=1)
        order = cents[np.lexsort((cents, cd))]
        for p in nprobes:
            probe = set(order[:p])
            cand = np.where(np.isin(cid_of, list(probe)))[0]
            cand = cand[cand != q]
            top = cand[np.lexsort((cand, -cos[cand]))][:K]
            curve[p].append(len(exact & set(top)) / K)
    return {p: float(np.mean(v)) for p, v in curve.items()}, len(cents)


def pq_recall_curve(
    spark, sf_dir: str, X: np.ndarray, shortlists: list[int]
) -> dict[int, float]:
    """Mean two-stage recall@K per ADC shortlist size, using the
    SHIPPED PQ codes."""
    rows = embedding_pq_encode(spark, sf_dir).collect()
    codes = {r["vec_id"]: [r[f"c{m}"] for m in range(PQ_M)] for r in rows}
    C = np.array([codes[i] for i in range(len(X))])
    A = X[:PQ_K]

    curve: dict[int, float] = {s: [] for s in shortlists}
    for q in query_sample(len(X)):
        l2 = ((X - X[q]) ** 2).sum(axis=1)
        l2[q] = np.inf
        exact = set(np.argsort(l2, kind="stable")[:K])
        grid = np.array(
            [
                ((X[q][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                  - A[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]) ** 2).sum(axis=1)
                for m in range(PQ_M)
            ]
        )  # (M, K) query-to-codebook distances, the ADC lookup grid
        adc = grid[np.arange(PQ_M)[:, None], C.T].sum(axis=0)
        adc[q] = np.inf
        order = np.argsort(adc, kind="stable")
        for s in shortlists:
            short = set(order[:s])
            curve[s].append(len(exact & short) / K)
    return {s: float(np.mean(v)) for s, v in curve.items()}


def main() -> None:
    from rust_etl_spark.session import get_spark

    tiers = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/gen_sf1"]
    spark = get_spark("ann-recall-tier")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sf_dir in tiers:
        tag = os.path.basename(sf_dir.rstrip("/"))
        X = load_corpus(sf_dir)
        mod = ivf_mod(len(X))
        # measure the historical fixed points AND the scale-aware
        # default (ivf_nprobe holds the probed fraction ~constant —
        # round 9; equals 4 at tiers with <= 20 cells).
        np_default = ivf_nprobe(ivf_n_cells(len(X), mod))
        nprobes = sorted({1, 2, 4, 8, 16, np_default})
        ivf, n_cells = ivf_recall_curve(spark, sf_dir, X, nprobes)
        shortlists = [10, 50, 100, 200, 500]
        pq_curve = pq_recall_curve(spark, sf_dir, X, shortlists)
        record = {
            "tier": tag,
            "n_vectors": len(X),
            "ivf_mod": mod,
            "n_cells": n_cells,
            "n_queries": int(len(query_sample(len(X)))),
            "k": K,
            "nprobe_default": np_default,
            "ivf_recall_by_nprobe": ivf,
            "pq_rerank_recall_by_shortlist": pq_curve,
            "note": (
                "isotropic synthetic corpus = worst case for locality "
                "structures; exact ground truth over the full corpus, "
                "shipped Spark cells/codes"
            ),
        }
        out = os.path.join(root, f"ANN_RECALL_{tag}.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(json.dumps(record))


if __name__ == "__main__":
    main()
