#!/bin/bash
# Regenerate the complete scale-evidence chain on SHIPPED code
# (VERDICT r7 #1): benches at all four tiers, scale audits at all four
# tiers, streaming + curation measurements, then SCALING.md.
# Run serially on a quiet machine (~60-90 min).
set -e
cd "$(dirname "$0")/.."

# Cold-page-cache pre-warm (VERDICT r12 #4; mechanism diagnosed round
# 11, re-adjudicated by hand for three straight rounds of chain
# movers): column-pruned parquet reads are seeky and ~3.5x slower
# cold, and a query's own noop re-runs do NOT self-warm — one
# SEQUENTIAL read per file restores the warm value. All tiers total
# ~2.5 GB against 125 GB RAM, so pages stay resident across the whole
# chain; the per-stage re-warms below are then memory-speed no-ops
# that only matter if something evicted in between.
warm() {
  for d in "$@"; do
    [ -d "$d" ] && find "$d" -name '*.parquet' -type f -print0 | sort -z | xargs -0 cat > /dev/null
  done
  true
}
ALL_TIERS="/root/testdata/sf0.1 /root/repo/gen_sf0.3 /root/repo/gen_sf1 /root/repo/gen_sf3 /root/repo/gen_sf10"
echo "=== pre-warm all tiers ==="
time warm $ALL_TIERS

echo "=== bench sf0.1 ==="
warm /root/testdata/sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py && cp BENCH_LOCAL.json BENCH_sf0.1.json
echo "=== bench gen_sf0.3 ==="
warm /root/repo/gen_sf0.3
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf0.3 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf0.3.json
echo "=== bench gen_sf1 ==="
warm /root/repo/gen_sf1
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf1 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf1.json
echo "=== bench gen_sf3 ==="
warm /root/repo/gen_sf3
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf3 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf3.json
# restore the default-tier BENCH_LOCAL.json (sf0.1 is the committed one)
cp BENCH_sf0.1.json BENCH_LOCAL.json

echo "=== scale_audit sf0.1 ==="
warm /root/testdata/sf0.1
python scripts/scale_audit.py
echo "=== scale_audit gen_sf0.3 ==="
warm /root/repo/gen_sf0.3
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf0.3 python scripts/scale_audit.py
echo "=== scale_audit gen_sf1 ==="
warm /root/repo/gen_sf1
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf1 python scripts/scale_audit.py
echo "=== scale_audit gen_sf3 ==="
warm /root/repo/gen_sf3
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf3 python scripts/scale_audit.py

echo "=== stream_bench ==="
warm $ALL_TIERS
python scripts/stream_bench.py
echo "=== curation_bench ==="
warm $ALL_TIERS
python scripts/curation_bench.py
echo "=== bucketed_layout_bench ==="
warm $ALL_TIERS
python scripts/bucketed_layout_bench.py

echo "=== scaling_report ==="
python scripts/scaling_report.py
echo "=== DONE ==="

# FULL extended set at 100x, not headline-only: the round-8 full run
# is what caught dedup_embedding_lsh's quadratic pair expansion and
# q21's advisory-size spill — the extended set holds the heavy ops.
echo "=== bench gen_sf10 full ==="
warm /root/repo/gen_sf10
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf10 python bench.py && cp BENCH_LOCAL.json BENCH_gen_sf10.json
cp BENCH_sf0.1.json BENCH_LOCAL.json
echo "=== scale_audit gen_sf10 full ==="
warm /root/repo/gen_sf10
SPARK_GRAFT_SF_DIR=/root/repo/gen_sf10 python scripts/scale_audit.py
echo "=== scaling_report (with 100x) ==="
python scripts/scaling_report.py
echo "=== DONE incl 100x ==="
