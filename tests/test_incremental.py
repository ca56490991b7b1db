"""Incremental ingest: files are processed exactly once across
restarts (checkpoint recovery), new files are picked up."""

from __future__ import annotations

import json
import os

from rust_etl_spark.streaming.incremental import start_incremental_ingest

SCHEMA = "id long, name string"


def _drop_file(src_dir: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_incremental_aggregate_matches_batch_recompute(spark, tmp_path):
    """The maintained summary after several file drops must equal a
    from-scratch GROUP BY over everything that landed."""
    from rust_etl_spark.streaming.aggregate_sink import start_incremental_aggregate

    src = str(tmp_path / "landing")
    summary = str(tmp_path / "summary")
    ckpt = str(tmp_path / "ckpt_agg")
    os.makedirs(src)
    schema = "k string, v double"

    _drop_file(src, "a.jsonl", [{"k": "x", "v": 1.0}, {"k": "y", "v": 2.0}])
    q = start_incremental_aggregate(spark, src, summary, ckpt, schema, "k", "v")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _drop_file(src, "b.jsonl", [{"k": "x", "v": 3.0}, {"k": "z", "v": 5.0}])
    q2 = start_incremental_aggregate(spark, src, summary, ckpt, schema, "k", "v")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {r["k"]: (r["n"], r["total"]) for r in spark.read.parquet(summary).collect()}
    assert got == {"x": (2, 4.0), "y": (1, 2.0), "z": (1, 5.0)}


def test_exactly_once_across_restarts(spark, tmp_path):
    src = str(tmp_path / "landing")
    dest = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _drop_file(src, "batch1.jsonl", [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
    q = start_incremental_ingest(spark, src, dest, ckpt, SCHEMA)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(dest).count() == 2

    # restart with the same checkpoint: old file NOT reprocessed,
    # new file picked up
    _drop_file(src, "batch2.jsonl", [{"id": 3, "name": "c"}])
    q2 = start_incremental_ingest(spark, src, dest, ckpt, SCHEMA)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["id"]: r["name"] for r in spark.read.parquet(dest).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # exactly once each


def _force_epoch_replay(ckpt: str) -> None:
    """Simulate a crash between the batch write and the checkpoint
    commit: drop the newest ``commits/<n>`` file. On restart Structured
    Streaming finds offsets without a commit and re-executes that epoch
    with the same epoch_id — the at-least-once replay path."""
    commits = os.path.join(ckpt, "commits")
    latest = max(
        (f for f in os.listdir(commits) if not f.startswith(".")), key=int
    )
    os.remove(os.path.join(commits, latest))


def test_ingest_crash_replay_no_duplicates(spark, tmp_path):
    """Replaying a crashed epoch must overwrite its own output, not
    append duplicates (epoch-directory overwrite = idempotent sink)."""
    src = str(tmp_path / "landing")
    dest = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _drop_file(src, "batch1.jsonl", [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
    q = start_incremental_ingest(spark, src, dest, ckpt, SCHEMA)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _force_epoch_replay(ckpt)
    q2 = start_incremental_ingest(spark, src, dest, ckpt, SCHEMA)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = spark.read.parquet(dest).collect()
    assert len(rows) == 2  # replayed epoch overwrote, did not append
    assert {r["id"] for r in rows} == {1, 2}


def test_aggregate_sink_crash_replay_not_double_counted(spark, tmp_path):
    """A replayed epoch must NOT be summed onto stored partials a
    second time: the _applied_epoch marker (swapped in atomically with
    the summary) makes the additive sink exactly-once."""
    from rust_etl_spark.streaming.aggregate_sink import start_incremental_aggregate

    src = str(tmp_path / "landing")
    summary = str(tmp_path / "summary")
    ckpt = str(tmp_path / "ckpt_agg")
    os.makedirs(src)
    schema = "k string, v double"

    _drop_file(src, "a.jsonl", [{"k": "x", "v": 1.0}, {"k": "y", "v": 2.0}])
    q = start_incremental_aggregate(spark, src, summary, ckpt, schema, "k", "v")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _force_epoch_replay(ckpt)
    q2 = start_incremental_aggregate(spark, src, summary, ckpt, schema, "k", "v")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["k"]: (r["n"], r["total"]) for r in spark.read.parquet(summary).collect()}
    assert got == {"x": (1, 1.0), "y": (1, 2.0)}  # not doubled

    # ...and genuinely new data after the replay still lands.
    _drop_file(src, "b.jsonl", [{"k": "x", "v": 3.0}])
    q3 = start_incremental_aggregate(spark, src, summary, ckpt, schema, "k", "v")
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    got = {r["k"]: (r["n"], r["total"]) for r in spark.read.parquet(summary).collect()}
    assert got == {"x": (2, 4.0), "y": (1, 2.0)}
