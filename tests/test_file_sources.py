"""Round-trip coverage for the CSV / JSON-lines / ORC sources."""

from __future__ import annotations

import pytest

from rust_etl_spark.errors import EngineError
from rust_etl_spark.sources import load_table
from rust_etl_spark.sources.files import (
    read_avro,
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF, "nation")


def _assert_same_rows(a, b, key):
    ra = sorted(tuple(r) for r in a.select(*key).collect())
    rb = sorted(tuple(r) for r in b.select(*key).collect())
    assert ra == rb and len(ra) > 0


def test_csv_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "nation_csv")
    write_csv(nation, p)
    back = read_csv(spark, p, schema="n_nationkey int, n_name string, n_regionkey int")
    _assert_same_rows(nation, back, ["n_nationkey", "n_name", "n_regionkey"])


def test_csv_infer_fallback(spark, nation, tmp_path):
    p = str(tmp_path / "nation_csv2")
    write_csv(nation, p)
    back = read_csv(spark, p)  # inference path
    assert back.count() == nation.count()


def test_jsonl_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "nation_jsonl")
    write_jsonl(nation, p)
    back = read_jsonl(spark, p, schema="n_nationkey int, n_name string, n_regionkey int")
    _assert_same_rows(nation, back, ["n_nationkey", "n_name", "n_regionkey"])


def test_orc_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "nation_orc")
    write_orc(nation, p)
    _assert_same_rows(nation, read_orc(spark, p), ["n_nationkey", "n_name", "n_regionkey"])


def test_avro_gated(spark, tmp_path):
    with pytest.raises(EngineError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope.avro"))
