"""Dump .explain("formatted") for named catalog queries to text files.

Used by the optimization rounds to commit before/after plan evidence
(plans/r{N}/<query>_{before,after}.txt). Run from any checkout — the
repo root is derived from this file's location, so a git worktree at
an older commit dumps THAT commit's plans.

Usage:
    python scripts/dump_plans.py <out_dir> <suffix> <query> [<query> ...]
    SPARK_GRAFT_SF_DIR=...   data dir (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from rust_etl_spark.session import get_spark  # noqa: E402
    from rust_etl_spark.plans import catalog  # noqa: E402

    spark = get_spark()
    qs = catalog.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({suffix}) sf_dir={sf_dir}\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
