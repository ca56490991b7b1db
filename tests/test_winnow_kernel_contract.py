"""Executable pins for the doc_winnow numpy kernel contract.

The round-15 optimization moved the winnowing window fold from a
Catalyst ``transform(sequence(...), i -> array_min(slice(hs, i, W)))``
+ ``array_distinct`` + ``explode`` into a mapInPandas numpy kernel
(`text.py::_winnow_batches`) — 7.95 -> 3.08 s min-of-3 at the 100x
tier, outputs verified exceptAll-equal both ways over all 10.1M rows
before shipping. Parity is structural (int64 end to end; min over a
window of integers has no association freedom), but three conventions
still need pins: (1) docs shorter than one window emit NOTHING (the
Catalyst empty-sequence branch); (2) np.unique deduplicates to the
same VALUE SET as array_distinct (row order may differ — both the
driver hash and the oracle harness are order-insensitive); (3)
reduceat-free per-doc slicing keeps doc boundaries exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rust_etl_spark.operators.text import WINNOW_W, _winnow_batches


def _scalar_winnow(hs) -> set[int]:
    """Window-by-window mirror of the retired Catalyst fold."""
    if len(hs) < WINNOW_W:
        return set()
    return {min(hs[i : i + WINNOW_W]) for i in range(len(hs) - WINNOW_W + 1)}


def _run_kernel(rows):
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "hs": [np.asarray(r[1], dtype=np.int64) for r in rows],
        }
    )
    out = list(_winnow_batches()([pdf]))
    got: dict[int, set[int]] = {}
    for o in out:
        for d, fp in zip(o["doc_id"], o["fp"]):
            got.setdefault(int(d), set()).add(int(fp))
    return got


def test_matches_scalar_reference_on_random_docs():
    rng = np.random.default_rng(11)
    rows = []
    for doc_id in range(40):
        n = int(rng.integers(0, 30))
        hs = rng.integers(0, 1 << 60, size=n, dtype=np.int64)
        rows.append((doc_id, hs))
    got = _run_kernel(rows)
    for doc_id, hs in rows:
        want = _scalar_winnow(list(hs))
        assert got.get(doc_id, set()) == want, f"doc {doc_id}"


def test_short_docs_emit_nothing():
    rows = [(1, list(range(WINNOW_W - 1))), (2, []), (3, list(range(WINNOW_W)))]
    got = _run_kernel(rows)
    assert 1 not in got and 2 not in got
    assert got[3] == {0}  # single window, min is 0


def test_duplicate_window_minima_deduplicate():
    # constant stream: every window min is the same value -> one row
    rows = [(5, [42] * (WINNOW_W * 3))]
    got = _run_kernel(rows)
    assert got[5] == {42}


def test_empty_batch_skipped():
    empty = pd.DataFrame({"doc_id": [], "hs": []})
    b = pd.DataFrame({"doc_id": [7], "hs": [np.arange(WINNOW_W, dtype=np.int64)]})
    out = list(_winnow_batches()([empty, b]))
    assert len(out) == 1


def test_output_dtypes_are_int64():
    out = list(
        _winnow_batches()(
            [pd.DataFrame({"doc_id": [1], "hs": [np.arange(WINNOW_W, dtype=np.int64)]})]
        )
    )[0]
    assert out["doc_id"].dtype == np.int64
    assert out["fp"].dtype == np.int64
