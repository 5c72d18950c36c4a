#!/bin/bash
# Round-4 session-5 on-chip queue: runs AFTER tools/run_plan_bisect.sh
# (waits for its pid to exit), then in decision-value order:
#   1. CenterPoint NaN diagnosis (adv on, then adv off) — correctness first
#   2. lever sweep (one lean process per variant, tools/run_lever_sweep.sh)
#   3. inference bench re-run (the suite3 record died mid-run)
# Sequential by design: 1-core host + exclusive TPU.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session5.log
mkdir -p "$OUT"

if [ -f /tmp/plan_bisect.pid ]; then
  BPID=$(cat /tmp/plan_bisect.pid)
  while kill -0 "$BPID" 2>/dev/null; do sleep 20; done
fi

touch "$OUT/TPU_BENCH_RUNNING"
echo "session5 start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
  tail -c 2000 "$OUT/$name.out" >> "$LOG"
}

run DIAG_cp_nan       3600 python -m robustpointclouds_tpu.tools.diag_centerpoint_nan
run DIAG_cp_nan_noadv 3600 env DIAG_NOADV=1 python -m robustpointclouds_tpu.tools.diag_centerpoint_nan

bash tools/run_lever_sweep.sh

touch "$OUT/TPU_BENCH_RUNNING"
run BENCH_inference   7200 python -m robustpointclouds_tpu.tools.bench_inference

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "session5 done $(date -u +%FT%TZ)" >> "$LOG"
