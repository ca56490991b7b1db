"""PII handling for training-data curation: pseudonymization + masking.

Before corpus text or user tables feed a training pipeline, direct
identifiers must be removed or made non-reversible. Two standard moves,
both pure map-side column transforms (no shuffle, whole-stage codegen):

- **pseudonymize**: replace the natural key with a one-way hash
  (sha-256) so rows stay joinable across tables/runs without exposing
  the raw key;
- **mask**: scrub identifier digits embedded in free-text fields
  (names, addresses) with a redaction character, and record how many
  characters were redacted for audit.

Extends the reference's transform surface (SURVEY.md §2c — the
reference's processor only normalizes structure, it has no
privacy/scrubbing stage). At 100 TB both ops are embarrassingly
parallel: no aggregation, no join, nothing crosses partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_etl_spark.plans.catalog import register
from rust_etl_spark.sources import load_table


@register(
    "pii_pseudonymize",
    oracle="""
        SELECT sha256(CAST(c_custkey AS VARCHAR)) AS pseud_id,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
               CAST(length(c_name)
                    - length(regexp_replace(c_name, '[0-9]', '', 'g'))
                    AS BIGINT) AS digits_masked,
               c_mktsegment
        FROM customer
    """,
    doc="PII scrub over the customer table: natural key replaced by a sha-256 "
    "pseudonym (stable across runs/tables, non-reversible), identifier digits in "
    "the name masked with '#', per-row redaction count for audit. Pure map-side "
    "projection — zero shuffles at any scale.",
)
def pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymize + mask direct identifiers.

    sha2(key, 256) and regexp_replace are engine-portable: Spark's
    sha2 and DuckDB's sha256 both emit lowercase hex; '[0-9]' has the
    same semantics in Java regex and RE2 (DuckDB needs the explicit
    'g' flag to match Spark's replace-all default).
    """
    cust = load_table(spark, sf_dir, "customer")
    no_digits = F.regexp_replace(F.col("c_name"), "[0-9]", "")
    return cust.select(
        F.sha2(F.col("c_custkey").cast("string"), 256).alias("pseud_id"),
        F.regexp_replace(F.col("c_name"), "[0-9]", "#").alias("masked_name"),
        (F.length("c_name") - F.length(no_digits)).cast("long").alias("digits_masked"),
        "c_mktsegment",
    )
