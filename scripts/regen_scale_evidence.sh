#!/bin/bash
# Regenerate the complete scale-evidence chain on SHIPPED code
# (VERDICT r7 #1): benches at all four tiers, scale audits at all four
# tiers, streaming + curation measurements, then SCALING.md.
# Run serially on a quiet machine (~60-90 min).
set -e
cd "$(dirname "$0")/.."

echo "=== bench sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py && cp BENCH_LOCAL.json BENCH_sf0.1.json
echo "=== bench gen_sf0.3 ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf0.3 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf0.3.json
echo "=== bench gen_sf1 ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf1 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf1.json
echo "=== bench gen_sf3 ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf3 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf3.json
# restore the default-tier BENCH_LOCAL.json (sf0.1 is the committed one)
cp BENCH_sf0.1.json BENCH_LOCAL.json

echo "=== scale_audit sf0.1 ==="
python scripts/scale_audit.py
echo "=== scale_audit gen_sf0.3 ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf0.3 python scripts/scale_audit.py
echo "=== scale_audit gen_sf1 ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf1 python scripts/scale_audit.py
echo "=== scale_audit gen_sf3 ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf3 python scripts/scale_audit.py

echo "=== stream_bench ==="
python scripts/stream_bench.py
echo "=== curation_bench ==="
python scripts/curation_bench.py
echo "=== bucketed_layout_bench ==="
python scripts/bucketed_layout_bench.py

echo "=== scaling_report ==="
python scripts/scaling_report.py
echo "=== DONE ==="

# FULL extended set at 100x, not headline-only: the round-8 full run
# is what caught dedup_embedding_lsh's quadratic pair expansion and
# q21's advisory-size spill — the extended set holds the heavy ops.
echo "=== bench gen_sf10 full ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf10 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf10.json
cp BENCH_sf0.1.json BENCH_LOCAL.json
echo "=== scale_audit gen_sf10 full ==="
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf10 python scripts/scale_audit.py
echo "=== scaling_report (with 100x) ==="
python scripts/scaling_report.py
echo "=== DONE incl 100x ==="
