"""Every registered catalog query must match its DuckDB oracle —
the local version of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from rust_etl_spark.plans import catalog
from tests.oracle_harness import compare, duckdb_connection

catalog._ensure_loaded()
_ORACLED = sorted(catalog.oracle_sql().keys())
_ROWS_ONLY = sorted(set(catalog.queries().keys()) - set(_ORACLED))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = catalog.get(name)
    spark_df = q.fn(spark, sf_dir)
    oracle_pdf = con.execute(q.oracle).fetchdf()
    errs = compare(spark_df, oracle_pdf)
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = catalog.get(name)
    df = q.fn(spark, sf_dir)
    assert df.columns  # stable schema
    df.limit(5).collect()  # runs without error
