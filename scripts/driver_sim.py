"""Driver simulation: the exact contract the grading driver runs.

Builds a PLAIN SparkSession (none of session.py's configs — the driver
won't have them), smoke-runs ``entry``, then executes every
``queries()`` entry at sf0.01 and compares against ``oracle_sql()``
via DuckDB with the driver-strict harness. Also audits oracle result
cardinalities: a zero-row oracle "passes" while testing nothing.

Exit code 0 = all match, non-zero otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod
    from tests.oracle_harness import compare, duckdb_connection

    sf = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb_connection(sf)
    n_entry = mod.entry(spark).count()
    print(f"entry rows: {n_entry}")
    qs, osql = mod.queries(), mod.oracle_sql()
    fails, zeros = [], []
    for name, fn in qs.items():
        try:
            if name in osql:
                odf = con.execute(osql[name]).fetchdf()
                if len(odf) == 0:
                    zeros.append(name)
                errs = compare(fn(spark, sf), odf)
            else:
                errs = [] if fn(spark, sf).count() >= 0 else ["count failed"]
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            errs = [str(e)[:200]]
        if errs:
            fails.append((name, errs))
            print("FAIL", name, errs)
    print("zero-cardinality oracles:", zeros or "none")
    print("RESULT:", "ALL MATCH" if not fails else f"{len(fails)} FAILURES: {fails}")
    return 0 if not fails and not zeros else 1


if __name__ == "__main__":
    raise SystemExit(main())
