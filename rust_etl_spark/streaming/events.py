"""Structured Streaming surface over the events table.

The reference has no stream processing (SURVEY.md §2b — its
"streaming" is constant-memory IO), so this module is part of the
engine's extension surface: the same windowed aggregation runs as a
batch plan (oracle-verifiable, registered in plans/) and as a
Structured Streaming query with watermarked event time.

Scale notes: the streaming agg keys on (window, event_type) — state
size is bounded by (#windows in watermark horizon x #types); the
watermark expires state, so unbounded input never grows memory. The
file source here is a stand-in for Kafka: swap ``readStream.format``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_etl_spark.functions.money import VALUE_CENTS as _V_CENTS
from rust_etl_spark.functions.rounding import round_half_up
from rust_etl_spark.sources.tables import normalize_event_time


def _total_value_col():
    """Exact scaled-integer total of 2-decimal events.value — the same
    form as the batch plans (plans/events_queries.py), so streaming vs
    batch parity is value-identical, and sum state is a BIGINT (exact
    merge across micro-batches, no FP accumulation drift)."""
    return round_half_up(F.sum(F.expr(_V_CENTS)).cast("long") / F.lit(100.0), 2)

WINDOW = "5 minutes"
WATERMARK = "10 minutes"


def windowed_counts_batch(events: DataFrame) -> DataFrame:
    """Tumbling-window counts/sums per event_type (batch form)."""
    return (
        events.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _total_value_col().alias("total_value"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_dedup_once(spark: SparkSession, events_path: str) -> int:
    """Streaming exact dedup: the same events file delivered twice
    (two micro-batches of duplicates) must come out once.

    ``withWatermark + dropDuplicates([key, ts])`` is the streaming
    form of exact dedup — state holds one entry per key inside the
    watermark horizon and expires beyond it, so unbounded duplicate
    streams run in bounded memory. Returns the deduplicated count.
    """
    import shutil
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    watch_dir = tempfile.mkdtemp(prefix="events_dedup_")
    shutil.copy(events_path, f"{watch_dir}/a.parquet")
    shutil.copy(events_path, f"{watch_dir}/b.parquet")  # exact duplicates
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(watch_dir)
    stream = normalize_event_time(stream).withColumnRenamed("ts", "ts_event")
    deduped = stream.withWatermark("ts_event", WATERMARK).dropDuplicates(["event_id", "ts_event"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("events_deduped")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT count(*) AS n FROM events_deduped").collect()[0]["n"]


def run_stream_interval_join_once(spark: SparkSession, events_path: str) -> DataFrame:
    """Watermarked stream-stream interval join: signup events joined to
    the same user's follow-up events within 24 h — the streaming form
    of the batch ``events_range_join`` query (plans/events_queries.py),
    which the test validates it against row-for-row.

    Both sides carry a watermark and the join condition bounds event
    time on both ends, so Spark can expire join state: memory holds
    only rows inside watermark + interval, regardless of stream length.
    Returns the joined (signup_id, event_id) pairs from the memory sink.
    """
    import shutil
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    watch_dir = tempfile.mkdtemp(prefix="events_ssjoin_")
    shutil.copy(events_path, watch_dir)
    schema = spark.read.parquet(events_path).schema

    def src():
        # Raw stream source bypasses load_table, so route through the
        # same schema-robust normalizer (nanos-long or NTZ vintage).
        s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(watch_dir)
        return normalize_event_time(s).withColumnRenamed("ts", "ts_ev")

    signups = (
        src()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts_ev").alias("ts_s"),
        )
        .withWatermark("ts_s", "1 hour")
    )
    follows = (
        src()
        .select("event_id", F.col("user_id").alias("e_user"), F.col("ts_ev").alias("ts_e"))
        .withWatermark("ts_e", "1 hour")
    )
    joined = signups.join(
        follows,
        F.expr(
            "e_user = s_user AND ts_e > ts_s AND ts_e <= ts_s + INTERVAL 24 HOURS"
        ),
    ).select("signup_id", "event_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("events_ssjoin")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT signup_id, event_id FROM events_ssjoin")


def run_stream_once(spark: SparkSession, sf_dir: str, events_path: str) -> DataFrame:
    """Drive the streaming agg over a bounded file source to
    completion (memory sink) and return the result as a DataFrame —
    the standard local smoke for a streaming plan."""
    import shutil
    import tempfile

    # events.ts is parquet TIMESTAMP(NANOS) — see sources/tables.py.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source requires a *directory* to watch.
    watch_dir = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(events_path, watch_dir)
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(watch_dir)
    stream = normalize_event_time(stream)
    agg = (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _total_value_col().alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_windowed")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM events_windowed")


SESSION_GAP = "30 minutes"


def run_stream_sessions_once(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming gap sessionization: the native ``session_window`` with
    a watermark, driven over a bounded file stream — the streaming form
    of the batch ``events_session_window`` query, which the test
    validates it against row-for-row.

    State is one open session per user inside the watermark horizon;
    the gap timeout closes sessions, the watermark expires them — so
    an unbounded event stream sessionizes in bounded memory. Append
    mode emits each session exactly once, when it finalizes.
    """
    import shutil
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    watch_dir = tempfile.mkdtemp(prefix="events_sess_")
    shutil.copy(events_path, watch_dir)
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(watch_dir)
    stream = normalize_event_time(stream)
    agg = (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _total_value_col().alias("total_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s_start_us"),
            F.unix_micros("w.end").alias("s_end_us"),
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("events_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM events_sessions")
