"""Scalar-function surface: strings, dates, math, conditionals,
arrays, exact percentiles — the built-in function coverage an engine
must expose (reference has only the cast chain, SURVEY.md §2b, so this
is extension surface). All expressions stay inside whole-stage codegen
and every query carries an exact DuckDB mirror.

Determinism notes: transcendental results (ln/log10/sqrt/stddev) are
rounded to 6 digits — libm implementations may differ in the last ulp;
everything else is exact integer/string arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_etl_spark.functions.money import O_TOTALPRICE_CENTS as _O_CENTS
from rust_etl_spark.functions.rounding import round_half_up, round_half_up_sql
from rust_etl_spark.plans.catalog import register
from rust_etl_spark.sources import load_table


@register(
    "string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                                   AS name_upper,
               substring(p_name, 1, 10)                        AS name_prefix,
               CAST(length(p_name) AS BIGINT)                  AS name_len,
               regexp_replace(p_name, '[aeiou]', '', 'g')      AS name_novowels,
               split_part(p_name, ' ', 1)                      AS first_word,
               lpad(p_brand, 12, '*')                          AS brand_padded,
               reverse(p_type)                                 AS type_rev,
               concat(p_brand, ':', p_type)                    AS brand_type
        FROM part
    """,
    doc="String function coverage: case, substring, length, regex, split, pad, reverse, concat.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.reverse("p_type").alias("type_rev"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT)     AS y,
               CAST(month(o_orderdate) AS INT)    AS m,
               CAST(day(o_orderdate) AS INT)      AS d,
               CAST(quarter(o_orderdate) AS INT)  AS q,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        FROM orders
    """,
    doc="Date/time function coverage: parts extraction, day difference, month arithmetic.",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.add_months(d, 3).alias("plus3m"),
    )


@register(
    "date_trunc_rollup",
    oracle=f"""
        SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS wk,
               CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS mo,
               CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qtr,
               count(*) AS n,
               {round_half_up_sql(f"CAST(sum({_O_CENTS}) AS BIGINT) / 100.0", 2)} AS total
        FROM orders
        GROUP BY 1, 2, 3
    """,
    doc="Calendar bucketing: ISO-week/month/quarter truncation with per-bucket "
    "aggregates (both engines truncate weeks to Monday).",
)
def date_trunc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.groupBy(
            F.date_trunc("week", d).cast("date").alias("wk"),
            F.date_trunc("month", d).cast("date").alias("mo"),
            F.date_trunc("quarter", d).cast("date").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_O_CENTS)).cast("long").alias("cents"),
        )
        .select(
            "wk", "mo", "qtr", "n",
            round_half_up(F.col("cents") / F.lit(100.0), 2).alias("total"),
        )
    )


@register(
    "math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 30000)                    AS dev,
               CAST(ceil(l_quantity) AS BIGINT)                AS qty_ceil,
               CAST(floor(l_extendedprice) AS BIGINT)          AS price_floor,
               floor(sqrt(l_extendedprice) * 1000000.0 + 0.5) / 1000000.0      AS price_sqrt,
               floor(ln(l_extendedprice + 1) * 1000000.0 + 0.5) / 1000000.0    AS price_ln,
               floor(log10(l_extendedprice + 1) * 1000000.0 + 0.5) / 1000000.0 AS price_log10,
               floor(power(l_discount + 1, 2) * 1000000.0 + 0.5) / 1000000.0   AS disc_sq,
               CAST(sign(l_discount - 0.05) AS BIGINT)         AS disc_sign,
               l_orderkey % 7                                  AS key_mod
        FROM lineitem
    """,
    doc="Math function coverage: abs/ceil/floor/sqrt/ln/log10/pow/sign/mod.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000).alias("dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        # round_half_up, not F.round: these are DERIVED floats (sqrt/ln/
        # log10/pow of money), where round(double, n) is only empirically
        # portable — the floor form is portable by construction.
        round_half_up(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        round_half_up(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        round_half_up(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        round_half_up(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        # BIGINT on both sides: DuckDB sign() is TINYINT, Spark signum is
        # DOUBLE (and can emit -0.0) — either difference flips the driver hash.
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "stats_regression",
    oracle="""
        SELECT o_orderpriority,
               floor(corr(o_totalprice, CAST(o_custkey AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS r,
               floor(covar_samp(o_totalprice, CAST(o_custkey AS DOUBLE)) * 100.0 + 0.5) / 100.0    AS cov,
               floor(regr_slope(o_totalprice, CAST(o_custkey AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS slope,
               floor(regr_intercept(o_totalprice, CAST(o_custkey AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS icept
        FROM orders GROUP BY o_orderpriority
    """,
    doc="Bivariate statistical aggregates per group: Pearson correlation, sample "
    "covariance, least-squares slope/intercept.",
)
def stats_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y, x = F.col("o_totalprice"), F.col("o_custkey").cast("double")
    # Derived statistical aggregates: portable half-up floor rounding
    # on both engines (negatives round half-toward-+inf identically).
    return orders.groupBy("o_orderpriority").agg(
        round_half_up(F.corr(y, x), 6).alias("r"),
        round_half_up(F.covar_samp(y, x), 2).alias("cov"),
        round_half_up(F.regr_slope(y, x), 6).alias("slope"),
        round_half_up(F.regr_intercept(y, x), 4).alias("icept"),
    )


@register(
    "bitwise_funcs",
    oracle="""
        SELECT l_returnflag,
               bit_and(l_orderkey)               AS k_and,
               bit_or(l_orderkey)                AS k_or,
               bit_xor(l_orderkey)               AS k_xor,
               CAST(max(l_orderkey & 255) AS BIGINT)      AS max_low_byte,
               CAST(max(l_orderkey >> 8) AS BIGINT)       AS max_high
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Bitwise scalar + aggregate surface: AND/OR/XOR aggregates, masks, shifts.",
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("k_and"),
        F.bit_or("l_orderkey").alias("k_or"),
        F.bit_xor("l_orderkey").alias("k_xor"),
        F.max(F.expr("l_orderkey & 255")).alias("max_low_byte"),
        F.max(F.expr("shiftright(l_orderkey, 8)")).alias("max_high"),
    )


@register(
    "safe_cast_parse",
    oracle="""
        SELECT p_partkey,
               TRY_CAST(p_size AS BIGINT)                         AS size_big,
               TRY_CAST(p_name AS BIGINT)                         AS name_as_int,
               TRY_CAST(regexp_extract(p_type, '[0-9]+') AS BIGINT) AS type_digits
        FROM part
    """,
    doc="Error-free casting surface: try_cast yields NULL instead of failing on "
    "malformed input (ANSI-safe ingestion over dirty columns).",
)
def safe_cast_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("string").try_cast("bigint").alias("size_big"),
        F.col("p_name").try_cast("bigint").alias("name_as_int"),
        F.regexp_extract("p_type", "[0-9]+", 0).try_cast("bigint").alias("type_digits"),
    )


@register(
    "conditional_null",
    oracle="""
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'BUILDING'), '(masked)') AS seg_masked,
               CASE WHEN c_acctbal < 0 THEN 'debtor'
                    WHEN c_acctbal < 5000 THEN 'regular'
                    ELSE 'premium' END AS tier,
               greatest(c_acctbal, 0.0) AS bal_clamped,
               least(CAST(c_nationkey AS BIGINT), 10) AS nation_capped
        FROM customer
    """,
    doc="Conditional/null semantics: nullif+coalesce masking, CASE tiers, greatest/least.",
)
def conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(masked)")).alias("seg_masked"),
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "regular")
        .otherwise("premium")
        .alias("tier"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("c_nationkey").cast("long"), F.lit(10)).alias("nation_capped"),
    )


@register(
    "percentile_stats",
    oracle="""
        SELECT o_orderstatus,
               floor(quantile_cont(o_totalprice, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
               floor(quantile_cont(o_totalprice, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
               floor(stddev_samp(o_totalprice) * 10000.0 + 0.5) / 10000.0         AS sd,
               round(min(o_totalprice), 2)                AS lo,
               round(max(o_totalprice), 2)                AS hi
        FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact linear-interpolation percentiles + dispersion per group.",
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        # Derived order-stat interpolations / dispersion: portable
        # half-up floor rounding (lo/hi below are raw parquet values,
        # where round() cannot hit a boundary).
        round_half_up(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        round_half_up(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        round_half_up(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS vmax,
               CAST(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS vmin,
               CAST(embedding[1] AS DOUBLE) AS e1,
               CAST(embedding[2] AS DOUBLE) AS e2,
               CAST(embedding[3] AS DOUBLE) AS e3,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
        FROM embeddings
    """,
    doc="Array function coverage: size, min/max, element access, filter-count over embeddings. "
    "(Scalar outputs only: array-valued result columns don't stringify identically across engines.)",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max(dbl).alias("vmax"),
        F.array_min(dbl).alias("vmin"),
        F.element_at(dbl, 1).alias("e1"),
        F.element_at(dbl, 2).alias("e2"),
        F.element_at(dbl, 3).alias("e3"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )
