"""Idle re-measure adjudication, as a machine-readable artifact
(round-15 VERDICT #1/#2: driver-window bench noise was being
adjudicated in SCALING.md prose — "idle re-measures reverted to the
r13 band" — with the idle values living nowhere a future round can
diff against; the repo's own STREAM_BENCH lesson is to generate the
watch notes FROM committed rows).

Picks the biggest calibrated per-query movers between two committed
bench records (default: the two highest-numbered BENCH_r*.json),
re-measures each on THIS quiet machine — page-cache warm, min-of-N
noop executions, fresh CPU calibration anchor — and writes
IDLE_REMEASURES.json. scripts/scaling_report.py renders the
adjudication table from it.

Run on a QUIET machine:
    python scripts/idle_remeasure.py                 # sf0.1 movers
    python scripts/idle_remeasure.py --sf-dir gen_sf10 \
        --base BENCH_gen_sf10.json --queries q21 dedup_containment
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load(path: str) -> dict:
    with open(os.path.join(ROOT, path)) as f:
        return json.load(f)


def _round_records() -> list[str]:
    recs = []
    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            recs.append((int(m.group(1)), os.path.basename(p)))
    return [name for _, name in sorted(recs)]


def _all_queries(rec: dict) -> dict[str, float]:
    out = dict(rec.get("queries") or {})
    out.update(rec.get("queries_extended") or {})
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--base", help="committed record to diff against "
                   "(default: second-highest BENCH_r*.json)")
    p.add_argument("--cur", help="record whose movers to adjudicate "
                   "(default: highest BENCH_r*.json)")
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--queries", nargs="*",
                   help="explicit query names (skips mover selection)")
    args = p.parse_args()

    rounds = _round_records()
    base_name = args.base or rounds[-2]
    cur_name = args.cur or rounds[-1]
    base, cur = _load(base_name), _load(cur_name)
    bq, cq = _all_queries(base), _all_queries(cur)
    b_cal, c_cal = base["calibration_sec"], cur["calibration_sec"]

    if args.queries:
        names = args.queries
    else:
        movers = []
        for name, b_sec in bq.items():
            c_sec = cq.get(name)
            # skip sub-0.1s queries: their spreads exceed their values
            if not c_sec or b_sec < 0.1:
                continue
            movers.append((name, (c_sec / c_cal) / (b_sec / b_cal)))
        movers.sort(key=lambda t: -t[1])
        names = [n for n, _ in movers[: args.top]]

    import bench
    from rust_etl_spark.plans.catalog import get
    from rust_etl_spark.session import get_spark

    spark = get_spark("idle-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_page_cache(args.sf_dir)
    my_cal = bench._calibration()

    rows = []
    for name in names:
        q = get(name)
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        idle = round(min(runs), 3)
        row = {
            "query": name,
            "base_sec": bq.get(name),
            "cur_sec": cq.get(name),
            "idle_min_sec": idle,
            "idle_spread_sec": round(max(runs) - min(runs), 3),
        }
        if bq.get(name):
            row["cur_vs_base_calibrated"] = round(
                (cq[name] / c_cal) / (bq[name] / b_cal), 3) if cq.get(name) else None
            row["idle_vs_base_calibrated"] = round(
                (idle / my_cal) / (bq[name] / b_cal), 3)
        rows.append(row)
        print(json.dumps(row))

    record = {
        "sf_dir": args.sf_dir,
        "base_record": base_name,
        "cur_record": cur_name,
        "base_calibration_sec": b_cal,
        "cur_calibration_sec": c_cal,
        "idle_calibration_sec": my_cal,
        "runs_per_query": args.runs,
        "queries": rows,
        "note": "idle_vs_base_calibrated ~1.0 adjudicates the cur-record "
        "elevation as measurement-window noise on unchanged plans",
    }
    out = os.path.join(ROOT, "IDLE_REMEASURES.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
