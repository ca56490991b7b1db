"""Multimodal plumbing: binary payloads, metadata, mapInPandas
feature extraction (deterministic values pinned), decode stub."""

from __future__ import annotations

import hashlib

import pytest

from rust_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_features,
)

SF = "/root/testdata/sf0.001"


def test_payload_and_features_deterministic(spark):
    df = spark.createDataFrame([(1, "hi"), (2, "héllo")], "doc_id long, text string")
    enriched = attach_binary_payload(df)
    rows = {r["doc_id"]: r for r in enriched.collect()}
    assert bytes(rows[1]["payload"]) == b"hi"
    assert rows[2]["meta"]["n_bytes"] == len("héllo".encode())
    assert rows[1]["meta"]["digest"] == hashlib.md5(b"hi").hexdigest()

    feats = {r["doc_id"]: r for r in extract_features(enriched).collect()}
    assert feats[1]["n_bytes"] == 2
    assert feats[1]["head_hex"] == b"hi".hex()
    assert feats[1]["mean_byte"] == (ord("h") + ord("i")) / 2


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
