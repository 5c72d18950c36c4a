#!/bin/bash
# Round-4 session-5 on-chip queue (v2): runs AFTER tools/run_plan_bisect.sh
# (waits for its pid to exit), then:
#   1. CenterPoint NaN diag — now validates the logit-focal/f32-head fix
#      (commit 76d4dc8) on chip: 20 per-dispatch steps, expect 0 non-finite
#   2. bench_centerpoint — the throughput record that NaN'd in suite3
#   3. bench_inference re-run (the suite3 record died mid-run)
# The lever sweep is NOT chained here: its form is decided by the bisect's
# predisp verdict (see tools/run_lever_sweep.sh header).
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

run DIAG_cp_nan        3600 python -m robustpointclouds_tpu.tools.diag_centerpoint_nan
run BENCH_centerpoint2 5400 python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_inference2   7200 python -m robustpointclouds_tpu.tools.bench_inference

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "session5 done $(date -u +%FT%TZ)" >> "$LOG"
