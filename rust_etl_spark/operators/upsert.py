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
recoverable ``._upsert_old`` which the NEXT call restores to the
target path before merging (the aside copy is the only full table at
that point — it is never deleted unless the target also exists).
This is crash-safe, not transactional — a
concurrent reader can still see the directory change underneath it;
snapshot isolation needs a table format (Delta/Iceberg), whose jars
are not in this environment. (Write-then-rename mirrors the staging
atomization of the reference, /root/reference/src/main.rs:10.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def restore_aside(target_path: str) -> bool:
    """Recover from a crash that landed between the swap's two renames:
    the previous table was moved aside to ``._upsert_old`` but the new
    one never arrived, so the aside copy is the only surviving full
    table. Rename it back; return True if a restore happened.

    Callers that read table state (markers, stored partials) BEFORE
    invoking :func:`upsert_parquet` must call this first, so their
    reads see the recovered table rather than a missing directory."""
    old_path = target_path.rstrip("/") + "._upsert_old"
    if os.path.exists(old_path) and not os.path.exists(target_path):
        os.rename(old_path, target_path)
        return True
    return False


def upsert_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    marker_files: dict[str, str] | None = None,
) -> None:
    """Insert-or-replace rows of ``updates`` into the parquet table at
    ``target_path``, matching on ``keys``.

    ``marker_files`` (name -> content) are written into the staged
    directory BEFORE the swap, so they become visible atomically with
    the new table version — callers use this to persist e.g. the last
    applied streaming epoch with exactly-once semantics. Names must
    start with ``_`` or ``.`` so parquet readers ignore them."""
    for name in marker_files or {}:
        # Validate before any Spark job runs: an invalid name must not
        # cost a full parquet write or leave a stray staging directory.
        if not name.startswith(("_", ".")):
            raise ValueError(f"marker file {name!r} must start with '_' or '.'")
    tmp_path = target_path.rstrip("/") + "._upsert_tmp"
    old_path = target_path.rstrip("/") + "._upsert_old"
    restore_aside(target_path)
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        kept = target.join(updates.select(*keys), keys, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(tmp_path)
    for name, content in (marker_files or {}).items():
        with open(os.path.join(tmp_path, name), "w") as fh:
            fh.write(content)
    if os.path.exists(old_path) and os.path.exists(target_path):
        # Leftover aside copy from a crash AFTER the new table landed —
        # the target is intact, so the aside copy is safe to drop.
        shutil.rmtree(old_path)
    if os.path.exists(target_path):
        os.rename(target_path, old_path)
    os.rename(tmp_path, target_path)
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
