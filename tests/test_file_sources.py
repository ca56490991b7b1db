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


def test_jsonl_permissive_quarantines_corrupt_rows(spark, tmp_path):
    """Malformed lines must land in _corrupt_record, not fail the job."""
    from rust_etl_spark.sources.files import read_jsonl_permissive

    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{broken json!!\n"
        '{"id": 2, "name": "also ok"}\n'
        '["wrong", "shape"]\n'
    )
    df = read_jsonl_permissive(spark, str(p), "id long, name string")
    # caching avoids the known Spark quirk where a query over ONLY the
    # corrupt column on an uncached permissive read is disallowed
    df = df.cache()
    good = df.filter(df["_corrupt_record"].isNull())
    bad = df.filter(df["_corrupt_record"].isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 2
    assert any("broken" in r["_corrupt_record"] for r in bad.collect())


def test_parquet_schema_evolution_merges(spark, tmp_path):
    """Files written with widening schemas must read as one table under
    mergeSchema, with missing columns NULL-filled."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(f"{d}/v1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(f"{d}/v2")
    df = spark.read.option("mergeSchema", True).option("recursiveFileLookup", True).parquet(d)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_avro_gated(spark, tmp_path):
    with pytest.raises(EngineError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope.avro"))
