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


def test_upsert_recovers_from_crash_between_renames(spark, tmp_path):
    """A crash between the swap's two renames leaves target missing and
    ``._upsert_old`` holding the only full copy; the next call must
    restore it, not rebuild the table from the new updates alone."""
    import os

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    upsert_parquet(spark, path, base, ["k"])

    # Simulate the crash window: target was moved aside, new dir never landed.
    os.rename(path, path + "._upsert_old")
    assert not os.path.exists(path)

    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    upsert_parquet(spark, path, updates, ["k"])
    # History (keys 1 and 3) survives; the aside copy is gone.
    assert _read(spark, path) == {1: "a", 2: "B", 3: "c", 4: "d"}
    assert not os.path.exists(path + "._upsert_old")


def test_upsert_cleans_stale_old_when_target_intact(spark, tmp_path):
    """A crash after the new table landed but before cleanup leaves a
    stale aside copy next to an intact target; the next call drops the
    stale copy and merges against the (newer) target."""
    import os
    import shutil

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    upsert_parquet(spark, path, base, ["k"])
    shutil.copytree(path, path + "._upsert_old")  # stale copy, target intact

    updates = spark.createDataFrame([(2, "B")], "k long, v string")
    upsert_parquet(spark, path, updates, ["k"])
    assert _read(spark, path) == {1: "a", 2: "B"}
    assert not os.path.exists(path + "._upsert_old")
