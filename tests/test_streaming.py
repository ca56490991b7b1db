"""Structured Streaming smoke: the windowed event aggregation must
produce identical results streamed (file source, watermark, memory
sink) and as the equivalent batch plan."""

from __future__ import annotations

import os

from rust_etl_spark.sources import load_table
from rust_etl_spark.streaming.events import (
    run_stream_dedup_once,
    run_stream_once,
    windowed_counts_batch,
)

SF = "/root/testdata/sf0.001"


def test_stream_dedup_removes_replayed_batch(spark):
    n = run_stream_dedup_once(spark, f"{SF}/events.parquet")
    expect = load_table(spark, SF, "events").count()
    assert n == expect  # the duplicated delivery collapsed to one copy


def _key(rows):
    return sorted((str(r["w_start"] if "w_start" in r.__fields__ else r["w_start_us"]), r["event_type"], r["n"], r["total_value"]) for r in rows)


def test_stream_interval_join_matches_batch_range_join(spark):
    """The watermarked stream-stream interval join must produce exactly
    the pair set the batch events_range_join aggregates over."""
    import pyspark.sql.functions as F

    from rust_etl_spark.plans import catalog
    from rust_etl_spark.streaming.events import run_stream_interval_join_once

    pairs = run_stream_interval_join_once(spark, f"{SF}/events.parquet")
    got = (
        pairs.groupBy("signup_id")
        .agg(F.count(F.lit(1)).alias("n_follow"))
        .collect()
    )
    want = catalog.get("events_range_join").fn(spark, SF).collect()
    assert {(r["signup_id"], r["n_follow"]) for r in got} == {
        (r["signup_id"], r["n_follow"]) for r in want
    }


def test_stream_matches_batch(spark):
    events_path = os.path.join(SF, "events.parquet")
    streamed = run_stream_once(spark, SF, events_path)
    batch = windowed_counts_batch(load_table(spark, SF, "events"))
    s = sorted((str(r["w_start"]), r["event_type"], r["n"], r["total_value"]) for r in streamed.collect())
    b = sorted((str(r["w_start"]), r["event_type"], r["n"], r["total_value"]) for r in batch.collect())
    assert s == b
    assert len(s) > 0
