"""End-to-end curation curve (VERDICT r6 #5 / r7 #5: extend to 30x).

Times `examples/curate_corpus.py` — the composed six-stage pipeline —
once per tier, each in its OWN subprocess so JVM startup is billed
identically at every point (matching how the round-6 two-point curve
was measured). Writes CURATION_BENCH.json; scripts/scaling_report.py
renders the curve into SCALING.md.

Run:  python scripts/curation_bench.py   (~4 min over 4 tiers)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIERS = [
    ("sf0.1", 1, "/root/testdata/sf0.1"),
    ("gen_sf0.3", 3, os.path.join(ROOT, "gen_sf0.3")),
    ("gen_sf1", 10, os.path.join(ROOT, "gen_sf1")),
    ("gen_sf3", 30, os.path.join(ROOT, "gen_sf3")),
    # 100x (round 8): 500k documents — the tier where per-stage data
    # volume finally outgrows the JVM-startup floor.
    ("gen_sf10", 100, os.path.join(ROOT, "gen_sf10")),
]


def main() -> None:
    tiers = []
    for tier, mult, sf_dir in TIERS:
        if not os.path.isdir(sf_dir):
            print(f"skip {tier}: {sf_dir} missing")
            continue
        out_dir = tempfile.mkdtemp(prefix=f"curation_bench_{tier}_")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "examples", "curate_corpus.py"),
             sf_dir, out_dir],
            capture_output=True, text=True, cwd=ROOT,
        )
        wall = round(time.perf_counter() - t0, 1)
        shutil.rmtree(out_dir, ignore_errors=True)
        if proc.returncode != 0:
            print(f"FAIL {tier}: {proc.stderr[-500:]}")
            raise SystemExit(1)
        survivors = next(
            (ln.split(":")[1].split("(")[0].strip()
             for ln in proc.stdout.splitlines() if "survivors after mix" in ln),
            None,
        )
        row = {"tier": tier, "mult": mult, "wall_sec": wall,
               "survivors": int(survivors) if survivors else None}
        tiers.append(row)
        print(row)

    record = {
        "metric": "curation_pipeline_wall_subprocess",
        "tiers": tiers,
        "note": "one subprocess per tier; JVM startup included at every point",
    }
    with open(os.path.join(ROOT, "CURATION_BENCH.json"), "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"wrote CURATION_BENCH.json ({len(tiers)} tiers)")


if __name__ == "__main__":
    main()
