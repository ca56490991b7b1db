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
