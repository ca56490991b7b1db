"""Small-file compaction: plan determinism + packing bounds + content
equality after rewrite (operators/maintenance.py)."""

from __future__ import annotations

import os

from rust_etl_spark.operators.maintenance import compact_parquet, plan_compaction
from rust_etl_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_plan_compaction_is_deterministic_and_bounded():
    sizes = {f"f{i}.parquet": (i * 37) % 900 + 100 for i in range(50)}
    target = 2000
    bins, untouched = plan_compaction(sizes, target)
    bins2, untouched2 = plan_compaction(dict(reversed(list(sizes.items()))), target)
    assert bins == bins2 and untouched == untouched2, "plan must not depend on listing order"
    packed = [f for b in bins for f in b]
    assert sorted(packed + untouched) == sorted(sizes)
    for b in bins:
        assert len(b) >= 2, "singleton bins are write amplification"
        assert sum(sizes[f] for f in b) <= target


def test_plan_compaction_leaves_large_files_alone():
    sizes = {"big.parquet": 10_000, "a.parquet": 10, "b.parquet": 20}
    bins, untouched = plan_compaction(sizes, 1000)
    assert "big.parquet" in untouched
    assert bins == [["b.parquet", "a.parquet"]]


def test_compact_parquet_rewrites_equal_content(spark, tmp_path):
    events = load_table(spark, SF, "events").drop("props")
    frag = str(tmp_path / "frag")
    events.repartition(48).write.mode("overwrite").parquet(frag)
    n_small = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_small >= 40

    total = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    out = str(tmp_path / "compact")
    stats = compact_parquet(spark, frag, target_bytes=total // 6 + 1, out_path=out)

    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out == stats["n_output_files"] < n_small / 3, "compaction must merge small files"

    before = events.orderBy("event_id").collect()
    after = spark.read.parquet(out).orderBy("event_id").collect()
    assert before == after, "compaction must not change row content"
