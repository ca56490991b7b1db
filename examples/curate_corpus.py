"""End-to-end corpus curation example — the composed pipeline a
training-data run executes, wired from the repo's verified operators:

1. quality-score every document and gate at CURATION_MIN_QUALITY;
2. drop every near-duplicate except the per-cluster keeper
   (MinHash-LSH candidate pairs -> connected components);
3. write the surviving corpus as parquet plus a per-language summary.

Run:  python examples/curate_corpus.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rust_etl_spark.operators.dedup import corpus_curation  # noqa: E402
from rust_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("curate-corpus-example")

    kept = corpus_curation(spark, sf_dir)
    kept.write.mode("overwrite").partitionBy("lang").parquet(out_dir)

    summary = (
        spark.read.parquet(out_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )
    print(f"curated corpus written to {out_dir} (partitioned by lang)")
    for r in summary.collect():
        print(f"  {r['lang']}: {r['n_docs']} docs, avg quality {r['avg_quality']}, {r['total_chars']} chars")


if __name__ == "__main__":
    main()
