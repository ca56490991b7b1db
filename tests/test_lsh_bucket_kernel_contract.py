"""Executable pins for the lsh_buckets numpy kernel contract.

The round-15 optimization moved the random-hyperplane bucket
assignment from a Catalyst fold (zip_with over dims x transform over
planes — 512 lambda evaluations and an 8-double allocation per
DIMENSION per row) into a mapInPandas numpy kernel
(`similarity.py::_lsh_bucket_batches`) — buckets verified
exceptAll-equal over all 200k gen_sf10 vectors before shipping. The
swap is oracle-bit-identical only under the same conventions the
other FP kernels pin (test_pq_kernel_contract.py,
test_lsh_pair_kernel_contract.py): (1) each dot accumulates with an
explicit dimension-ASCENDING loop of elementwise ``acc + (x * w)`` —
the fold's left-to-right association — never np.dot/np.sum; (2) the
sign test is ``floor(dp * 1e6 + 0.5) > 0`` exactly; (3) keep_vector
emits the float64-cast vector, the same cast as to_double_array.

The reference is a deliberately scalar left-to-right Python fold
(Python floats ARE IEEE float64).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from rust_etl_spark.operators.similarity import (
    N_DIMS,
    N_PLANES,
    _lsh_bucket_batches,
    _plane_weights,
)


def _scalar_bucket(vec, planes) -> int:
    bucket = 0
    for i, w in enumerate(planes):
        dp = 0.0
        for d in range(len(vec)):
            dp = dp + float(vec[d]) * w[d]
        if math.floor(dp * 1e6 + 0.5) > 0:
            bucket += 1 << i
    return bucket


def _run(vectors, keep_vector=False):
    planes = _plane_weights(N_PLANES)
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(len(vectors))),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vectors],
        }
    )
    out = list(_lsh_bucket_batches(planes, N_PLANES, keep_vector)([pdf]))
    assert len(out) == 1
    return out[0]


def test_matches_scalar_fold_on_random_vectors():
    rng = np.random.default_rng(3)
    vectors = rng.standard_normal((100, N_DIMS)).astype(np.float32)
    planes = _plane_weights(N_PLANES)
    got = _run(vectors)
    for vid, b in zip(got["vec_id"], got["bucket"]):
        want = _scalar_bucket(vectors[int(vid)].astype(np.float64), planes)
        assert int(b) == want, f"vec {vid}"


def test_sign_test_boundary_uses_floor_half_up():
    # dp exactly 0 -> floor(0.5) = 0 -> bit NOT set (strict > 0)
    planes = [[0.0] * N_DIMS for _ in range(N_PLANES)]
    pdf = pd.DataFrame(
        {"vec_id": [1], "embedding": [np.ones(N_DIMS, dtype=np.float32)]}
    )
    out = list(_lsh_bucket_batches(planes, N_PLANES, False)([pdf]))[0]
    assert int(out["bucket"][0]) == 0


def test_keep_vector_emits_float64_cast():
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((3, N_DIMS)).astype(np.float32)
    out = _run(vecs, keep_vector=True)
    for vid, v in zip(out["vec_id"], out["v"]):
        ref = vecs[int(vid)].astype(np.float64)
        assert np.array_equal(np.asarray(v), ref)
        assert np.asarray(v).dtype == np.float64


def test_empty_batch_skipped_and_dtypes():
    empty = pd.DataFrame({"vec_id": [], "embedding": []})
    b = pd.DataFrame({"vec_id": [7], "embedding": [np.zeros(N_DIMS, dtype=np.float32)]})
    out = list(_lsh_bucket_batches(_plane_weights(N_PLANES), N_PLANES, False)([empty, b]))
    assert len(out) == 1
    assert out[0]["vec_id"].dtype == np.int64
    assert out[0]["bucket"].dtype == np.int64
