"""Deduplication operators (SURVEY.md §2c): exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:
- *exact* dedup groups on a 128-bit content hash, not the full text —
  the shuffle moves 16-byte keys + ids, never documents;
- *MinHash-LSH* is the scale path for near-dup: k universal hashes
  over the distinct-token set, banded so candidate generation is an
  equi-join on (band, signature) — no pairwise comparison ever touches
  non-candidates. Band signatures are plain shuffle keys, so AQE can
  split skewed buckets;
- *n-gram Jaccard* computes exact pair similarity as a sparse
  token-posting self-join (inverted-index pattern) — cost is bounded
  by document frequency per shingle, not n^2;
- *SimHash* reduces each doc to one 32-bit signature: near-dups
  collide exactly, grouping is a trivial hash shuffle;
- *embedding cosine* is quadratic by nature; the registered query runs
  the brute-force form (correctness oracle), the LSH-bucketed variant
  in operators/similarity.py is the scale path.

All hashing is the cross-engine md5-based family from
functions.hashing, so every stage has an exact DuckDB mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rust_etl_spark.functions.hashing import (
    HASH_P,
    md5_long60,
    md5_long60_sql,
    universal_hash,
    universal_hash_sql,
)
from rust_etl_spark.functions.textfns import (
    distinct_tokens,
    distinct_tokens_sql,
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)
from rust_etl_spark.functions.vectors import cosine, cosine_sql, to_double_array
from rust_etl_spark.plans.catalog import register
from rust_etl_spark.sources import load_table

# ---------------------------------------------------------------- exact

@register(
    "dedup_exact",
    oracle="""
        SELECT doc_id, text, lang, source, n_chars FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents
        ) t WHERE rn = 1
    """,
    doc="Exact dedup keeping the lowest doc_id per text (deterministic survivor).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@register(
    "dedup_exact_hash",
    oracle="""
        SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    doc="Hash-groupBy exact dedup: shuffle 16-byte fingerprints, never documents.",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


# ------------------------------------------------------------- minhash

MINHASH_K = 8          #: number of hash functions
MINHASH_BAND_ROWS = 2  #: rows per band => 4 bands

def _mh_a(i):  # odd multipliers
    return 1 + 2 * i

def _mh_b(i):
    return 12_345 + 7_919 * i


def minhash_signatures(spark: SparkSession, docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, i, mh): the k-row MinHash signature of each doc's
    distinct-token set, via universal hashing of md5-hashed tokens."""
    tok = docs.select("doc_id", F.explode(distinct_tokens("text")).alias("tok"))
    tok = tok.withColumn("th", md5_long60("tok"))
    params = spark.range(k).select(F.col("id").cast("long").alias("i"))
    hashed = tok.crossJoin(F.broadcast(params)).select(
        "doc_id",
        "i",
        universal_hash(F.col("th"), 1 + 2 * F.col("i"), 12_345 + 7_919 * F.col("i")).alias("uh"),
    )
    return hashed.groupBy("doc_id", "i").agg(F.min("uh").alias("mh"))


def minhash_bands(sig: DataFrame, band_rows: int = MINHASH_BAND_ROWS) -> DataFrame:
    """(doc_id, band, sig): banded signature strings, i-ordered."""
    banded = sig.withColumn("band", F.floor(F.col("i") / band_rows))
    return (
        banded.groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("i", "mh"))).alias("parts"))
        .select(
            "doc_id",
            "band",
            F.concat_ws(",", F.transform("parts", lambda s: s["mh"].cast("string"))).alias("sig"),
        )
    )


_MINHASH_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({distinct_tokens_sql('text')}) AS tok FROM documents
    ), h AS (
        SELECT doc_id, {md5_long60_sql('tok')} AS th FROM tok
    ), params AS (
        SELECT unnest(range(0, {MINHASH_K})) AS i
    ), mh AS (
        SELECT doc_id, i,
               min({universal_hash_sql('th', '1 + 2 * i', '12345 + 7919 * i')}) AS mh
        FROM h CROSS JOIN params GROUP BY doc_id, i
    ), band AS (
        SELECT doc_id, i // {MINHASH_BAND_ROWS} AS band,
               string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
        FROM mh GROUP BY doc_id, i // {MINHASH_BAND_ROWS}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM band a JOIN band b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""


@register(
    "dedup_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    doc=f"MinHash({MINHASH_K})+LSH({MINHASH_BAND_ROWS}-row bands) near-dup candidate pairs.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bands = minhash_bands(minhash_signatures(spark, docs))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ------------------------------------------------------- ngram jaccard

JACCARD_SHINGLE_N = 3
JACCARD_THRESHOLD = 0.2

_SHINGLES_SQL = f"list_distinct({word_shingles_sql(tokens_sql('text'), JACCARD_SHINGLE_N)})"

_JACCARD_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh FROM documents
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc=f"Exact {JACCARD_SHINGLE_N}-gram Jaccard pairs >= {JACCARD_THRESHOLD} via inverted-index self-join.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(tokens("text"), JACCARD_SHINGLE_N))).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ------------------------------------------------------------- simhash

SIMHASH_BITS = 32

_SIMHASH_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({distinct_tokens_sql('text')}) AS tok FROM documents
    ), h AS (
        SELECT doc_id, {md5_long60_sql('tok')} AS th FROM tok
    ), bits AS (
        SELECT unnest(range(0, {SIMHASH_BITS})) AS j
    ), contrib AS (
        SELECT doc_id, j,
               sum(CASE WHEN (th // (CAST(1 AS BIGINT) << j)) % 2 = 1 THEN 1 ELSE -1 END) AS c
        FROM h CROSS JOIN bits GROUP BY doc_id, j
    )
    SELECT doc_id,
           sum(CASE WHEN c > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash
    FROM contrib GROUP BY doc_id
"""


@register(
    "dedup_simhash",
    oracle=_SIMHASH_ORACLE,
    doc=f"{SIMHASH_BITS}-bit SimHash signature per document (near-dups collide).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(distinct_tokens("text")).alias("tok"))
    tok = tok.withColumn("th", md5_long60("tok"))
    bits = spark.range(SIMHASH_BITS).select(
        F.col("id").cast("long").alias("j"),
        F.pow(F.lit(2.0), F.col("id")).cast("long").alias("p"),  # exact for j <= 31
    )
    contrib = (
        tok.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "j",
            "p",
            F.when((F.expr(f"th div p") % 2) == 1, F.lit(1)).otherwise(F.lit(-1)).alias("s"),
        )
        .groupBy("doc_id", "j", "p")
        .agg(F.sum("s").alias("c"))
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum(F.when(F.col("c") > 0, F.col("p")).otherwise(F.lit(0))).alias("simhash"))
    )


# ------------------------------------------- embedding cosine near-dup

COSINE_NEARDUP_TAU = 0.8

_COSINE_PAIRS_ORACLE = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {cosine_sql('a.embedding', 'b.embedding')} AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_NEARDUP_TAU}
"""


@register(
    "dedup_embedding_cosine",
    oracle=_COSINE_PAIRS_ORACLE,
    doc=f"Embedding near-dup pairs: cosine >= {COSINE_NEARDUP_TAU} (brute-force oracle form; "
    "LSH-bucketed variant in operators/similarity.py is the scale path).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    score = cosine(F.col("va"), F.col("vb"))
    return pairs.select("vec_a", "vec_b", score.alias("score")).filter(
        F.col("score") >= COSINE_NEARDUP_TAU
    )
