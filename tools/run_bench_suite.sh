#!/bin/bash
# One-shot round-4 bench suite at current HEAD (TPU confirmed up).
# Sequential by design: 1-core host, never two compile processes at once.
# Lock protocol: work_dirs/TPU_BENCH_RUNNING exists while this runs.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/suite.log
mkdir -p "$OUT"
touch "$OUT/TPU_BENCH_RUNNING"
echo "suite start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
}

run BENCH_inline      5400  python bench.py
run BENCH_pillars     7200  python -m robustpointclouds_tpu.tools.bench_pointpillars
run BENCH_plan_diag   7200  python -m robustpointclouds_tpu.tools.bench_plan_diag
run BENCH_r4_step    14400  python -m robustpointclouds_tpu.tools.bench_r4_step
run BENCH_centerpoint 7200  python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_inference   7200  python -m robustpointclouds_tpu.tools.bench_inference

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "suite done $(date -u +%FT%TZ)" >> "$LOG"
