"""Boundary probes for round-2 operators: in-memory documents shaped to
hit the edges the parquet fixtures can't guarantee (payload lengths
exactly on frame boundaries, TF-IDF score ties), compared Spark vs
DuckDB on the same rows — the fixture-independent analogue of the
oracle gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rust_etl_spark.operators.multimodal import FRAME_BYTES, FRAME_HEAD, FRAME_STRIDE


def _frame_sample_reference(text: str):
    payload = text.encode("utf-8")
    import math

    n_frames = math.ceil(len(payload) / FRAME_BYTES)
    out = []
    for idx in range(0, n_frames, FRAME_STRIDE):
        head = payload[idx * FRAME_BYTES : idx * FRAME_BYTES + FRAME_HEAD]
        out.append((n_frames, idx, head.hex()))
    return out


def test_frame_sample_boundaries(spark):
    """Lengths 0 / FRAME-1 / FRAME / FRAME+1 / exact multiples, and a
    multi-byte char straddling a frame edge (byte, not char, framing)."""
    texts = [
        "",
        "a" * (FRAME_BYTES - 1),
        "b" * FRAME_BYTES,
        "c" * (FRAME_BYTES + 1),
        "d" * (FRAME_BYTES * FRAME_STRIDE),
        "e" * (FRAME_BYTES - 1) + "é" + "f" * 100,  # 2-byte char on the edge
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # Re-run the registered query body against this frame instead of the
    # fixture table by monkey-free inlining: same expressions.
    payload = F.encode("text", "utf-8")
    p = df.select(
        "doc_id",
        F.lower(F.hex(payload)).alias("payload_hex"),
        F.ceil(F.octet_length(payload) / float(FRAME_BYTES)).alias("n_frames"),
    )
    idx = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.lit(FRAME_STRIDE).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    sampled = p.select("doc_id", "n_frames", "payload_hex", F.explode(idx).alias("frame_idx"))
    got = {
        (r["doc_id"], r["frame_idx"]): (r["n_frames"], r["frame_head"])
        for r in sampled.select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.expr(
                f"substring(payload_hex, frame_idx * {2 * FRAME_BYTES} + 1, {2 * FRAME_HEAD})"
            ).alias("frame_head"),
        ).collect()
    }
    want = {}
    for i, t in rows:
        for n_frames, idx_, head_hex in _frame_sample_reference(t):
            want[(i, idx_)] = (n_frames, head_hex)
    assert got == want
    assert (0, 0) not in got  # empty doc emits no frames


def test_kmeans_lloyd_matches_numpy(spark):
    """3 Lloyd rounds on Spark must agree with a NumPy reference run
    from the same deterministic init (tolerance for summation order)."""
    import numpy as np
    import pyarrow.parquet as pq

    from rust_etl_spark.operators.similarity import (
        ivf_mod,
        KMEANS_ITERS,
        kmeans_lloyd,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    X = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    cent_ids = sorted(int(i) for i in ids if i % ivf_mod(len(ids)) == 0)
    cents = {cid: X[list(ids).index(cid)].copy() for cid in cent_ids}

    for _ in range(KMEANS_ITERS):
        members: dict[int, list[int]] = {cid: [] for cid in cents}
        order = sorted(cents)
        C = np.array([cents[c] for c in order])
        for row, x in enumerate(X):
            # l2sq rounds to 6 digits before the argmin on the Spark
            # side; mirror that so near-ties resolve identically.
            d = np.round(((C - x) ** 2).sum(axis=1), 6)
            # ties break on lower cid — matches ORDER BY dist, cid
            best = order[int(np.argmin(d))]
            members[best].append(row)
        cents = {
            cid: X[rows].mean(axis=0) for cid, rows in members.items() if rows
        }

    got = {}
    n_got = {}
    for r in kmeans_lloyd(spark, sf).collect():
        got.setdefault(r["cid"], {})[r["d"]] = r["c_val"]
        n_got[r["cid"]] = r["n_members"]
    assert set(got) == set(cents)
    for cid, vec in cents.items():
        for d, val in enumerate(vec):
            assert abs(got[cid][d] - round(val, 6)) <= 1e-6, (cid, d)


def test_tfidf_rank_breaks_ties_on_term(spark):
    """Equal rounded scores must rank alphabetically by term on both
    engines — two docs of two equal-frequency terms each."""
    # Every term is unique to its doc, so within-doc pairs tie exactly
    # (same tf, same df) and only the term tie-break orders them.
    rows = [(1, "zeta alpha"), (2, "beta beta gamma gamma"), (3, "delta delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("probe_docs")

    from rust_etl_spark.functions.textfns import tokens
    from pyspark.sql.window import Window

    tok_rows = df.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf_cnt"))
    stat = tf.withColumn(
        "dfreq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn("ntok", F.sum("tf_cnt").over(Window.partitionBy("doc_id")))
    n = df.agg(F.count(F.lit(1)).alias("n_corpus"))
    scored = stat.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        F.round(
            (F.col("tf_cnt") / F.col("ntok").cast("double"))
            * F.log(F.col("n_corpus").cast("double") / F.col("dfreq")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    ranked = scored.withColumn("rk", F.row_number().over(w))
    got = {(r["doc_id"], r["rk"]): r["term"] for r in ranked.collect()}
    # doc 1: zeta and alpha tie on score (both unique, tf 1/2) -> alpha first
    assert got[(1, 1)] == "alpha" and got[(1, 2)] == "zeta"
    # doc 2: beta/gamma tie -> beta first
    assert got[(2, 1)] == "beta" and got[(2, 2)] == "gamma"
