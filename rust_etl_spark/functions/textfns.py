"""Text-analysis column builders (JVM-side, codegen-friendly).

Every builder here has an exact DuckDB mirror (the ``*_sql`` strings)
so text operators stay oracle-verifiable. No Python UDFs: tokenize /
shingle / ratio logic is all built-in higher-order functions, which
keeps the hot path inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Lower-cased whitespace tokens; [] for blank text."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(F.lower(c))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def tokens_sql(expr: str) -> str:
    return (
        f"CASE WHEN length(trim(lower({expr}))) = 0 THEN [] "
        f"ELSE string_split_regex(trim(lower({expr})), '\\s+') END"
    )


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def distinct_tokens_sql(expr: str) -> str:
    return f"list_distinct({tokens_sql(expr)})"


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS BIGINT)"


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-token shingles ('a b c') of a token array; [] when < n tokens.

    PERF: pass a *materialized column reference* (select the token
    array into a column first), never the raw ``tokens(text)``
    expression — Catalyst re-evaluates the full tokenizer inside every
    ``element_at`` lambda call otherwise (no CSE across lambdas),
    which showed up as a 20x slowdown at sf0.1.
    """
    # Guard, don't clamp: sequence(1, 0) infers step -1 and yields [1, 0],
    # whose element_at(toks, 0) then raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    # for any doc with < n tokens. Return [] like the SQL mirror's
    # CASE WHEN len(t) < n branch.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )


def word_shingles_sql(toks_expr: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return (
        f"(SELECT CASE WHEN len(t) < {n} THEN [] "
        f"ELSE list_transform(range(1, len(t) - {n - 2}), i -> {parts}) END "
        f"FROM (SELECT ({toks_expr}) AS t))"
    )


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are lowercase letters or spaces."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(low, "[^a-z ]", "")) / F.length(c)
    )


def alpha_ratio_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0.0 "
        f"ELSE length(regexp_replace(lower({expr}), '[^a-z ]', '', 'g')) / length({expr}) END"
    )
