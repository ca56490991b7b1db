"""Upsert (MERGE emulation) into a parquet table.

Without a transactional table format, MERGE INTO is emulated as:
``kept = target ANTI JOIN updates ON keys``; ``new = kept UNION
updates``; atomically swap the table directory. In production this is
exactly what Delta/Iceberg's MERGE does under the hood (minus their
file-level pruning and snapshot isolation) — swap this module for
``MERGE INTO`` when those jars are available.

The result is materialized to a fresh directory and swapped in via
rename-aside (target -> target._old, tmp -> target, delete _old), so a
live table directory exists at every instant: a crash mid-write leaves
the old table untouched, and a crash between the two renames leaves a
recoverable ``._upsert_old`` next to the new table instead of a window
with no table at all. This is crash-safe, not transactional — a
concurrent reader can still see the directory change underneath it;
snapshot isolation needs a table format (Delta/Iceberg), whose jars
are not in this environment. (Write-then-rename mirrors the staging
atomization of the reference, /root/reference/src/main.rs:10.)
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
    old_path = target_path.rstrip("/") + "._upsert_old"
    if os.path.exists(old_path):  # leftover from a crashed previous swap
        shutil.rmtree(old_path)
    if os.path.exists(target_path):
        os.rename(target_path, old_path)
    os.rename(tmp_path, target_path)
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
