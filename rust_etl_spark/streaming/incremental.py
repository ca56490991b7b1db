"""Incremental ingestion: a checkpointed file-stream that converts
newly-arriving JSON-lines into parquet exactly once per input file —
the Auto-Loader-shaped extension SURVEY.md §7 anticipates.

Mechanics: Structured Streaming's file source tracks processed files
in the checkpoint, and each micro-batch is written to an
``epoch=<id>`` subdirectory in OVERWRITE mode, which makes the sink
idempotent: if the job dies after a partial batch write and restarts
from the checkpoint, the replayed epoch overwrites its own partial
output instead of appending duplicates (foreachBatch is at-least-once;
exactly-once needs an idempotent sink, which the deterministic
epoch directory provides). Readers consume ``dest_dir`` recursively —
``spark.read.parquet(dest_dir)`` discovers the epoch partitioning.
At scale this runs continuously against an object-store landing zone;
locally we drive it with ``processAllAvailable`` between file drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def start_incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
):
    """Begin (or resume) ingesting JSON-lines from ``source_dir`` into
    parquet at ``dest_dir``. Returns the StreamingQuery; caller drives
    it (``processAllAvailable``) or lets it run on a trigger."""
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).json(source_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Deterministic per-epoch directory + overwrite = idempotent
        # replay after a mid-batch crash (see module docstring).
        batch_df.write.mode("overwrite").parquet(f"{dest_dir.rstrip('/')}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
