"""Incrementally-maintained aggregates: a checkpointed file stream
keeps a materialized summary parquet up to date as new data lands —
the streaming analogue of a nightly GROUP BY recompute, without
rescanning history. Two variants share one exactly-once core:

- ``start_incremental_aggregate``: per-key (n, total) — the global
  rollup.
- ``start_incremental_window_aggregate``: per-(time-bucket, key) —
  the continuous aggregate / hypertable-rollup pattern: the summary is
  a time-series of window partials, old buckets stop changing once the
  stream moves past them, and a batch only ever rewrites the buckets
  it touches.

Mechanics: each micro-batch is pre-aggregated (count/sum per group
key), then merged into the summary table with ``upsert_parquet`` by
summing onto the stored partials (count and sum are algebraic, so
batch partials compose exactly). The summary stays queryable between
batches, and the upsert's rename-aside swap keeps a live directory at
every instant. At scale the summary table is keyed by a
low-cardinality dimension (plus a time bucket) and is orders of
magnitude smaller than the stream history.

Exactly-once: foreachBatch replays a failed batch, and this sink ADDS
onto stored partials — so each batch must be applied at most once. The
last applied epoch_id is persisted as a ``_applied_epoch`` marker file
written into the staged summary directory BEFORE the swap (see
``upsert_parquet(marker_files=...)``), making epoch and data visible
atomically: a replayed epoch_id <= the stored one is skipped, a crash
before the swap leaves the old epoch (and old partials) intact, and
there is no window where the data advanced but the epoch did not.
Markers are bound to their checkpoint (epoch ids restart at 0 with a
fresh checkpoint_dir), and a crash between the swap's two renames is
repaired by restoring the aside copy BEFORE any state is read.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _start_aggregate_sink(
    spark: SparkSession,
    source_dir: str,
    summary_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    partial_fn: Callable[[DataFrame], DataFrame],
    group_keys: list[str],
    merge_fn: Callable[[DataFrame], DataFrame] | None = None,
):
    """Shared exactly-once merge core. ``partial_fn`` turns a
    micro-batch into per-group partials; ``merge_fn`` combines the
    union of stored and batch partials back to one row per group
    (default: additive (n, total) — count/sum are algebraic). Any
    aggregate whose partials compose (min/max/min_by/sum...) slots in
    here; non-algebraic ones (exact median) would need the raw
    stream."""
    import json
    import os

    from rust_etl_spark.operators.upsert import restore_aside, upsert_parquet

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).json(source_dir)
    # Epoch ids are per-checkpoint (restart at 0 with a fresh
    # checkpoint_dir), so the marker records WHICH checkpoint the epoch
    # belongs to; a marker from a different checkpoint is stale and must
    # not suppress new batches.
    ckpt_id = os.path.abspath(checkpoint_dir)

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # A crash between the swap's two renames leaves the summary only
        # in the '._upsert_old' aside copy. Restore it BEFORE reading
        # the epoch marker or the stored partials — otherwise a replayed
        # epoch sees an empty table, merges batch-only partials, and the
        # later restore inside upsert_parquet anti-joins the recovered
        # rows away (permanent loss of accumulated partials).
        restore_aside(summary_path)
        epoch_file = os.path.join(summary_path, "_applied_epoch")
        if os.path.exists(epoch_file):
            with open(epoch_file) as fh:
                raw = fh.read().strip()
            try:
                marker = json.loads(raw)
                applied, marker_ckpt = int(marker["epoch"]), marker.get("ckpt")
            except (json.JSONDecodeError, TypeError, KeyError):
                applied, marker_ckpt = int(raw), None  # legacy bare-int marker
            if marker_ckpt in (None, ckpt_id) and int(epoch_id) <= applied:
                return  # replayed epoch: partials already include it
        partial = partial_fn(batch_df)
        if os.path.exists(summary_path):
            prev = spark.read.parquet(summary_path)
            both = prev.unionByName(partial)
            if merge_fn is not None:
                merged = merge_fn(both)
            else:
                merged = both.groupBy(*group_keys).agg(
                    F.sum("n").alias("n"), F.sum("total").alias("total")
                )
        else:
            merged = partial
        # collect to driver is NOT used: upsert rewrites via Spark jobs
        upsert_parquet(
            spark,
            summary_path,
            merged,
            group_keys,
            marker_files={
                "_applied_epoch": json.dumps({"epoch": int(epoch_id), "ckpt": ckpt_id})
            },
        )

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_incremental_aggregate(
    spark: SparkSession,
    source_dir: str,
    summary_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    key: str,
    value: str,
):
    """Maintain ``summary_path`` = per-``key`` (n, total of ``value``)
    over all JSON-lines files that ever landed in ``source_dir``."""

    def partial(batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"), F.sum(value).alias("total")
        )

    return _start_aggregate_sink(
        spark, source_dir, summary_path, checkpoint_dir, schema, partial, [key]
    )


def start_incremental_window_aggregate(
    spark: SparkSession,
    source_dir: str,
    summary_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    ts_col: str,
    key: str,
    value: str,
    window: str = "5 minutes",
):
    """Continuous aggregate (hypertable-rollup pattern): maintain
    ``summary_path`` = per-(tumbling ``window`` start, ``key``)
    (n, total of ``value``) over everything that ever landed.

    The time bucket joins the merge key, so late/replayed data sums
    into ITS bucket and never disturbs others; at scale the upsert's
    anti-join touches only the buckets present in the batch, and the
    summary doubles as the serving table for time-series dashboards
    (the batch-query mirror is ``events_window_agg`` /
    ``date_trunc_rollup``)."""

    def partial(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.groupBy(F.window(ts_col, window).alias("w"), key)
            .agg(F.count(F.lit(1)).alias("n"), F.sum(value).alias("total"))
            .select(
                F.unix_micros("w.start").alias("w_start_us"), key, "n", "total"
            )
        )

    return _start_aggregate_sink(
        spark,
        source_dir,
        summary_path,
        checkpoint_dir,
        schema,
        partial,
        ["w_start_us", key],
    )


def start_incremental_ohlc(
    spark: SparkSession,
    source_dir: str,
    summary_path: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    ts_col: str,
    key: str,
    value: str,
    id_col: str,
    window: str = "5 minutes",
):
    """Continuously-maintained OHLC candles: per (tumbling ``window``
    start, ``key``) keep n / open / high / low / close of ``value``
    as micro-batches land — the streaming twin of the batch
    ``events_ohlc`` query, via the same exactly-once merge core.

    OHLC is algebraic: a candle's partial state is
    (n, high, low, open + its ordering key, close + its ordering key),
    and two partials merge with sum/max/min/min_by/max_by — so late or
    replayed data folds into ITS candle deterministically (the
    ordering key (event-time micros, ``id_col``) is total, mirroring
    the batch query's tie-break). At scale the summary is
    candle-grain (keys x windows), orders of magnitude smaller than
    the stream, and each batch's upsert rewrites only the candles it
    touches.
    """
    ord_us = F.unix_micros(F.col(ts_col))

    def partial(batch_df: DataFrame) -> DataFrame:
        base = batch_df.select(
            F.window(ts_col, window).alias("w"),
            F.col(key),
            F.col(value).cast("double").alias("v"),
            ord_us.alias("e_us"),
            F.col(id_col).cast("long").alias("e_id"),
        ).select(
            F.unix_micros("w.start").alias("w_start_us"),
            key,
            "v",
            "e_us",
            "e_id",
        )
        ordk = F.struct(F.col("e_us").alias("us"), F.col("e_id").alias("id"))
        return base.groupBy("w_start_us", key).agg(
            F.count(F.lit(1)).alias("n"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.min_by(F.struct("e_us", "e_id", "v"), ordk).alias("o"),
            F.max_by(F.struct("e_us", "e_id", "v"), ordk).alias("c"),
        ).select(
            "w_start_us",
            key,
            "n",
            F.col("o.e_us").alias("open_us"),
            F.col("o.e_id").alias("open_id"),
            F.col("o.v").alias("open"),
            "high",
            "low",
            F.col("c.e_us").alias("close_us"),
            F.col("c.e_id").alias("close_id"),
            F.col("c.v").alias("close"),
        )

    def merge(both: DataFrame) -> DataFrame:
        # Each side of a candle keeps ITS OWN ordering key: the merged
        # open is the partial open with the earliest (open_us, open_id),
        # the merged close the partial close with the latest
        # (close_us, close_id).
        return (
            both.groupBy("w_start_us", key)
            .agg(
                F.sum("n").alias("n"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.min_by(
                    F.struct("open_us", "open_id", "open"),
                    F.struct("open_us", "open_id"),
                ).alias("o"),
                F.max_by(
                    F.struct("close_us", "close_id", "close"),
                    F.struct("close_us", "close_id"),
                ).alias("c"),
            )
            .select(
                "w_start_us",
                key,
                "n",
                F.col("o.open_us").alias("open_us"),
                F.col("o.open_id").alias("open_id"),
                F.col("o.open").alias("open"),
                "high",
                "low",
                F.col("c.close_us").alias("close_us"),
                F.col("c.close_id").alias("close_id"),
                F.col("c.close").alias("close"),
            )
        )

    return _start_aggregate_sink(
        spark,
        source_dir,
        summary_path,
        checkpoint_dir,
        schema,
        partial,
        ["w_start_us", key],
        merge_fn=merge,
    )
