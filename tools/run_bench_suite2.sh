#!/bin/bash
# Round-4 bench suite continuation (previous runner died with the session).
# Already captured at HEAD 17996cb..78615ec: BENCH_inline 16.619 f/s (1.385x),
# BENCH_pillars plan-fed 0.87 f/s (pathological scan form — remeasure no-plan).
# Sequential by design: 1-core host, never two compile processes at once.
# Lock protocol: work_dirs/TPU_BENCH_RUNNING exists while this runs.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/suite.log
mkdir -p "$OUT"
touch "$OUT/TPU_BENCH_RUNNING"
echo "suite2 start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
}

run BENCH_plan_diag     10800 python -m robustpointclouds_tpu.tools.bench_plan_diag
run BENCH_pillars_noplan 7200 env BENCH_NO_PLAN=1 python -m robustpointclouds_tpu.tools.bench_pointpillars
run BENCH_centerpoint    7200 python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_inference      7200 python -m robustpointclouds_tpu.tools.bench_inference

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "suite2 done $(date -u +%FT%TZ)" >> "$LOG"
