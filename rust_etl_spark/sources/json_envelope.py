"""JSON envelope source + the reference's transform core, end-to-end
(/root/reference/src/processor.rs:17-97 ``process_json_to_parquet``).

Reads a staged JSON document (either a root-level record array or an
envelope object whose ``root_path`` key holds the records), normalizes
it into a flat relational frame, applies column hygiene and codepoint
decoding, and refuses to produce output for empty tables.

Spark mapping notes:
- ``multiLine=true`` because government-API payloads are single JSON
  documents, not JSON-lines.
- The reference caps schema inference at the first 1000 records
  (processor.rs:24-27). Spark's JSON reader samples via
  ``samplingRatio``; for an explicit record cap we do a two-pass read:
  infer on a ``limit(infer_records)`` slice, then re-read the full
  file with the pinned schema — same contract, and at scale it avoids
  a full inference pass over TBs of staged JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rust_etl_spark.errors import SchemaError
from rust_etl_spark.operators.decode import decode_codepoint_arrays
from rust_etl_spark.operators.normalize import (
    TECHNICAL_COLUMNS,
    drop_technical,
    normalize_envelope,
    require_nonempty,
)

INFER_RECORDS_DEFAULT = 1000  # processor.rs:24-27 infer_schema_len


def read_json_document(
    spark: SparkSession,
    path: str,
    *,
    multiline: bool = True,
    infer_records: int = INFER_RECORDS_DEFAULT,
) -> DataFrame:
    """Scan a staged JSON document with capped schema inference.

    ``multiline=True`` (the envelope case) is one JSON object/array —
    inference touches exactly one document, no cap needed. For
    JSON-lines staging (``multiline=False``) the cap matters at scale:
    infer the schema from the first ``infer_records`` lines only, then
    re-read the full path with the pinned schema — the Spark analogue
    of ``infer_schema_len(1000)``.
    """
    if multiline:
        return spark.read.option("multiLine", "true").json(path)
    if infer_records <= 0:
        return spark.read.json(path)
    sample = spark.read.text(path).limit(infer_records)
    schema = spark.read.json(sample.rdd.map(lambda r: r.value)).schema
    return spark.read.schema(schema).json(path)


def process_json_document(
    spark: SparkSession,
    path: str,
    *,
    root_path: str | None = None,
    technical_columns: tuple[str, ...] = TECHNICAL_COLUMNS,
    infer_records: int = INFER_RECORDS_DEFAULT,
) -> DataFrame:
    """The full processor.rs transform chain as one declarative plan:

    scan -> empty guard -> dtype-dispatched normalize (explode_outer /
    struct flatten) -> drop technical columns -> decode codepoint
    arrays. Caller writes the result (sink stays separate so the same
    transform serves batch files, streams, and tests).
    """
    df = read_json_document(spark, path, infer_records=infer_records)
    if df.columns == ["_corrupt_record"]:
        # Unparseable JSON: the reader produced only the corrupt-record
        # column (parity: reference JsonReader error -> ProcessorError).
        raise SchemaError(f"unparseable JSON document {path!r}")
    df = require_nonempty(df, context=f"json document {path!r}")
    df = normalize_envelope(df, root_path)
    df = require_nonempty(df, context=f"records of {path!r}")
    df = drop_technical(df, technical_columns)
    return decode_codepoint_arrays(df)


def write_parquet(df: DataFrame, dest: str) -> None:
    """Snappy parquet sink (processor.rs:78-91). Spark always writes
    min/max/null-count column statistics; Snappy is the session
    default — exact parity with the reference's StatisticsOptions."""
    df.write.mode("overwrite").parquet(dest)
