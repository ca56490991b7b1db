"""Query catalog: the driver-facing registry of (spark query, DuckDB oracle).

Every operator the engine claims (SURVEY.md §2) registers here as a
named query over the fixture tables plus, where SQL-expressible, an
ANSI-SQL oracle DuckDB runs on the same parquet files. The driver
hash-compares both sides order-insensitively with columns sorted by
name, so:

- every computed column is aliased IDENTICALLY on both sides;
- floating aggregates are rounded (same ndigits) on both sides, so
  summation-order nondeterminism cannot flip the hash;
- top-k / rank queries carry total-order tie-breakers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in _REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


def get(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their @register side effects.
    from rust_etl_spark.plans import (  # noqa: F401
        advanced_agg,
        etl_parity,
        events_queries,
        functions_queries,
        relational,
        tpch_shapes,
    )
    from rust_etl_spark.operators import dedup, grouped, multimodal, similarity, text  # noqa: F401

    _LOADED = True
