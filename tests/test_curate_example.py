"""The end-to-end curation example must hold its accounting invariants
(each stage only removes; splits partition the survivors; the written
corpus is exactly the survivor set)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/examples")

SF = "/root/testdata/sf0.001"


def test_curation_run_accounting(spark, tmp_path):
    from curate_corpus import run

    out = str(tmp_path / "curated")
    card = run(spark, SF, out)
    c = card["counts"]

    assert 0 < c["after_clean"] <= c["input"]
    assert c["survivors"] <= c["after_clean"]
    assert sum(card["drop_by_rule"].values()) == c["input"]
    assert card["drop_by_rule"].get("keep", 0) == c["after_clean"]

    assert sum(card["per_split"].values()) == c["survivors"]
    assert set(card["per_split"]) <= {"train", "val", "test"}

    written = spark.read.parquet(out)
    assert written.count() == c["survivors"]
    assert {r["split"] for r in written.select("split").distinct().collect()} == set(
        card["per_split"]
    )

    p = card["packing"]
    assert p["n_docs"] == card["per_split"].get("train", 0)
    assert p["n_bins"] <= max(p["n_docs"], 1)
    # fill can't exceed the budget on multi-doc bins (single-doc bins may
    # exceed it by design); conservation: every train doc is packed once.
    assert p["total_tokens"] > 0
