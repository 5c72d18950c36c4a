#!/bin/bash
# Round-4 session-3 bench suite: first-priority on-chip numbers the moment
# the tunnel is up (CLAUDE.md). Ordered so decision-relevant results land
# first; each step times out and the suite continues on failure.
# Sequential by design: 1-core host, never two compile processes at once.
# Lock protocol: work_dirs/TPU_BENCH_RUNNING exists while this runs.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/suite.log
mkdir -p "$OUT"
touch "$OUT/TPU_BENCH_RUNNING"
echo "suite3 start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
}

run BENCH_inline          3600 python bench.py
run BENCH_plan_xs         5400 env BENCH_PLAN=1 python bench.py
run BENCH_pillars_noplan  3600 env BENCH_NO_PLAN=1 python -m robustpointclouds_tpu.tools.bench_pointpillars
run BENCH_pillars_plan    3600 python -m robustpointclouds_tpu.tools.bench_pointpillars
run BENCH_centerpoint     5400 python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_inference       7200 python -m robustpointclouds_tpu.tools.bench_inference
run BENCH_r4_step        14400 python -m robustpointclouds_tpu.tools.bench_r4_step

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "suite3 done $(date -u +%FT%TZ)" >> "$LOG"
