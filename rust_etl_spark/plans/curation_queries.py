"""Corpus-assembly operators a training-data pipeline runs after
cleaning/dedup: stratified sampling, per-group quantile gating,
weighted source mixing, and deterministic shuffling.

All four are hash-deterministic (md5-based, engine-portable — see
functions/hashing.py) rather than rand()-based: reproducible across
engines, task retries, speculative execution, and scale-ups, which is
what makes train/eval splits and ablation mixes auditable. Each is a
single linear dataflow whose only shuffle is the window/groupBy key
stated in its doc; none sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rust_etl_spark.functions.hashing import md5_long60, md5_long60_sql
from rust_etl_spark.plans.catalog import register
from rust_etl_spark.sources import load_table

_H_DOC = md5_long60_sql("doc_id")

STRATIFIED_QUOTA = 20

@register(
    "sample_stratified",
    oracle=f"""
        SELECT doc_id, lang, n_chars, rn FROM (
            SELECT doc_id, lang, n_chars,
                   CAST(row_number() OVER (
                        PARTITION BY lang ORDER BY {_H_DOC}, doc_id) AS BIGINT) AS rn
            FROM documents
        ) t WHERE rn <= {STRATIFIED_QUOTA}
    """,
    doc=f"Stratified sampling: a fixed quota of {STRATIFIED_QUOTA} docs per language, "
    "chosen by deterministic hash order (not rand()) so the sample is reproducible "
    "across engines/retries/scale-ups; one shuffle on the stratum key.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(md5_long60(F.col("doc_id")), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= STRATIFIED_QUOTA)
    )


QUANTILE_KEEP = 0.75


def _quantile_oracle() -> str:
    from rust_etl_spark.functions.rounding import round_half_up_sql

    return f"""
        SELECT doc_id, lang, n_chars, {round_half_up_sql('pr', 4)} AS pr FROM (
            SELECT doc_id, lang, n_chars,
                   percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS pr
            FROM documents
        ) t WHERE pr >= {QUANTILE_KEEP}
    """


@register(
    "quantile_filter",
    oracle=_quantile_oracle(),
    doc=f"Per-group quantile gate: keep docs at or above the per-language "
    f"{QUANTILE_KEEP:.0%} length percentile (percent_rank with a doc_id tie-break "
    "so rank — and therefore membership — is deterministic); the pattern behind "
    "'keep the top quartile by quality per language'. One shuffle on the group key.",
)
def quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rust_etl_spark.functions.rounding import round_half_up

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    pr = F.percent_rank().over(w)
    return (
        docs.select("doc_id", "lang", "n_chars", pr.alias("pr_raw"))
        .filter(F.col("pr_raw") >= QUANTILE_KEEP)
        .select("doc_id", "lang", "n_chars", round_half_up(F.col("pr_raw"), 4).alias("pr"))
    )


#: Per-language keep percentages of the training mix (en-heavy example).
MIX_PCT = {"en": 100, "de": 50, "fr": 50, "es": 25, "zh": 25}


@register(
    "dataset_mix",
    oracle=f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_H_DOC} % 100 <
              CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in MIX_PCT.items())}
              ELSE 0 END
    """,
    doc="Weighted dataset mixing: per-language keep fractions applied via a "
    "deterministic content-hash threshold (hash % 100 < pct) — the reweighting "
    "step that turns a raw corpus into a training mix, reproducible and "
    "shuffle-free (pure map-side filter).",
)
def dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pct = F.lit(0)
    for k, v in MIX_PCT.items():
        pct = F.when(F.col("lang") == k, F.lit(v)).otherwise(pct)
    return docs.filter(md5_long60(F.col("doc_id")) % 100 < pct).select(
        "doc_id", "lang", "source"
    )


SHUFFLE_BUCKETS = 32


@register(
    "shuffle_deterministic",
    oracle=f"""
        SELECT doc_id,
               {_H_DOC} % {SHUFFLE_BUCKETS} AS bucket,
               CAST(row_number() OVER (
                    PARTITION BY {_H_DOC} % {SHUFFLE_BUCKETS}
                    ORDER BY {_H_DOC}, doc_id) AS BIGINT) AS pos
        FROM documents
    """,
    doc=f"Deterministic global shuffle for training-order randomization: hash-assign "
    f"each doc to one of {SHUFFLE_BUCKETS} buckets, position within bucket by hash "
    "order. Shuffled order = (bucket, pos). Unlike a global row_number (single "
    "reducer) the per-bucket windows run fully parallel, and unlike rand() the "
    "permutation is stable across retries and engines.",
)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long60(F.col("doc_id"))
    w = Window.partitionBy(F.col("bucket")).orderBy(F.col("h"), F.col("doc_id"))
    return (
        docs.select("doc_id", h.alias("h"), (h % SHUFFLE_BUCKETS).alias("bucket"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "bucket", "pos")
    )
