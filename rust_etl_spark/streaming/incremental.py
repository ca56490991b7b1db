"""Incremental ingestion: a checkpointed file-stream that converts
newly-arriving JSON-lines into parquet exactly once per input file —
the Auto-Loader-shaped extension SURVEY.md §7 anticipates.

Mechanics: Structured Streaming's file source tracks processed files
in the checkpoint; ``foreachBatch`` appends each micro-batch through
the normal batch writer. Restarting the query with the same checkpoint
resumes where it left off — already-seen files are never reprocessed,
new files are picked up. At scale this runs continuously against an
object-store landing zone; locally we drive it with
``processAllAvailable`` between file drops.
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
        batch_df.write.mode("append").parquet(dest_dir)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
