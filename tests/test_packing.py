"""Sequence packing: the Arrow-sharded first-fit must match an
independent Python reference exactly and respect the bin invariants."""

from __future__ import annotations

import hashlib

from rust_etl_spark.operators.packing import (
    PACK_BUCKETS,
    PACK_MAX_TOKENS,
    pack_sequences,
)

SF = "/root/testdata/sf0.001"


def _md5_long60(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def _reference_pack(rows, max_tokens):
    """Independent first-fit over (doc_id, n_tokens) per bucket in
    (hash, doc_id) order — mirrors the contract, not the code."""
    by_bucket: dict[int, list[tuple[int, int, int]]] = {}
    for doc_id, n_tokens in rows:
        h = _md5_long60(doc_id)
        by_bucket.setdefault(h % PACK_BUCKETS, []).append((h, doc_id, n_tokens))
    want = {}
    for bucket, docs in by_bucket.items():
        cur, used = 0, 0
        for _h, doc_id, nt in sorted(docs):
            if used > 0 and used + nt > max_tokens:
                cur += 1
                used = 0
            used += nt
            want[doc_id] = (bucket, cur)
    return want


def test_packing_matches_reference_and_invariants(spark):
    out = pack_sequences(spark, SF).collect()
    got = {r["doc_id"]: (r["bucket"], r["bin_id"]) for r in out}

    # every document packed exactly once
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == len(got) == n_docs

    # exact agreement with the independent reference
    rows = [(r["doc_id"], r["n_tokens"]) for r in out]
    assert got == _reference_pack(rows, PACK_MAX_TOKENS)

    # bin budget: total <= max_tokens unless the bin is a single
    # oversized doc; bin ids contiguous from 0 per bucket
    bins: dict[tuple[int, int], list[int]] = {}
    for r in out:
        bins.setdefault((r["bucket"], r["bin_id"]), []).append(r["n_tokens"])
    for (_b, _i), toks in bins.items():
        assert sum(toks) <= PACK_MAX_TOKENS or len(toks) == 1
    for bucket in {b for b, _ in bins}:
        ids = sorted(i for b, i in bins if b == bucket)
        assert ids == list(range(len(ids)))

    # packing actually packs: fewer bins than docs
    assert len(bins) < n_docs


def test_packing_is_deterministic(spark):
    a = sorted(map(tuple, pack_sequences(spark, SF).collect()))
    b = sorted(map(tuple, pack_sequences(spark, SF).collect()))
    assert a == b
