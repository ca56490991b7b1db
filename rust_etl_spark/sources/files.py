"""File source/sink coverage beyond parquet+JSON-envelope: CSV,
JSON-lines, ORC (all native Spark readers — pushdown/pruning apply to
ORC exactly as parquet; CSV/JSON get projection pruning only).

Production posture: always pass an explicit schema for CSV/JSONL at
scale (``inferSchema`` burns a full extra pass over the data); the
helpers here accept one and only fall back to inference for ad-hoc
exploration. Avro would need the spark-avro package on the classpath —
gated with a clear error instead of a stub import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from rust_etl_spark.errors import EngineError


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    reader = spark.read.option("header", header).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # ad-hoc only: extra pass
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, *, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl_permissive(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines read that quarantines malformed rows instead of
    failing the job: good rows parse into ``schema``, broken lines land
    verbatim in ``corrupt_col`` (NULL elsewhere) — the ingestion
    posture for dirty landing zones at scale (fail-soft per row, the
    row-level analogue of the reference's per-endpoint fail-soft,
    /root/reference/src/main.rs:52-108).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = schema.add(T.StructField(corrupt_col, T.StringType(), True))
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source (needs the vendor driver jar on the classpath).

    At scale ALWAYS pass ``partition_column`` + bounds: without them
    Spark reads the whole table through one connection; with them the
    scan fans out over ``num_partitions`` range-predicate queries.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise EngineError("read_jdbc: partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - driver-jar dependent
        raise EngineError(f"jdbc source failed (is the vendor driver on the classpath?): {e}") from e


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro needs the spark-avro package (not on this classpath)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise EngineError(
            "avro source requires the spark-avro package on the classpath "
            "(add org.apache.spark:spark-avro to spark.jars.packages)"
        ) from e
