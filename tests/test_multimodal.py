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


def test_audio_rms_matches_pure_python(spark):
    """The numpy frame-RMS kernel must agree with an independent
    pure-Python computation on the same payload bytes."""
    import math

    from rust_etl_spark.operators.multimodal import AUDIO_FRAME, multimodal_audio_rms
    from rust_etl_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r for r in multimodal_audio_rms(spark, sf).collect()}
    docs = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    checked = 0
    for row in docs[:50]:
        b = row["text"].encode("utf-8")
        n = (len(b) // AUDIO_FRAME) * AUDIO_FRAME
        if n == 0:
            assert row["doc_id"] not in got
            continue
        rms = []
        for i in range(0, n, AUDIO_FRAME):
            fr = b[i : i + AUDIO_FRAME]
            rms.append(math.sqrt(sum(x * x for x in fr) / AUDIO_FRAME))
        g = got[row["doc_id"]]
        assert g["n_frames"] == len(rms)
        assert abs(g["rms_mean"] - sum(rms) / len(rms)) < 1e-9
        assert abs(g["rms_peak"] - max(rms)) < 1e-9
        checked += 1
    assert checked >= 20, "too few docs long enough to exercise framing"
