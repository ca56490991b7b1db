"""MERGE emulation: inserts, updates, and untouched rows in one pass;
repeatable (idempotent for identical updates)."""

from __future__ import annotations

from rust_etl_spark.operators.upsert import upsert_parquet


def _read(spark, path):
    return {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}


def test_upsert_insert_update_keep(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    upsert_parquet(spark, path, base, ["k"])  # initial load path
    assert _read(spark, path) == {1: "a", 2: "b", 3: "c"}

    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    upsert_parquet(spark, path, updates, ["k"])
    assert _read(spark, path) == {1: "a", 2: "B", 3: "c", 4: "d"}

    # idempotent for the same updates
    upsert_parquet(spark, path, updates, ["k"])
    assert _read(spark, path) == {1: "a", 2: "B", 3: "c", 4: "d"}
