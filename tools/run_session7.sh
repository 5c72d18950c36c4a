#!/bin/bash
# Round-4 session-5 part 3: waits for run_session6.sh (pid arg) to exit, then
# re-measures with the FETCH-BASED timers (block_until_ready signalled ready
# before device completion on the axon tunnel — bench_centerpoint read
# 1.3 ms/step for a full train scan):
#   1. bench_centerpoint (fixed timing)
#   2. bench_inference (fixed timing)
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session7.log
mkdir -p "$OUT"

PREV=${1:-}
if [ -n "$PREV" ]; then
  while kill -0 "$PREV" 2>/dev/null; do sleep 20; done
fi

touch "$OUT/TPU_BENCH_RUNNING"
echo "session7 start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
  tail -c 1500 "$OUT/$name.out" >> "$LOG"
}

run BENCH_centerpoint3 5400 python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_inference3   7200 python -m robustpointclouds_tpu.tools.bench_inference

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "session7 done $(date -u +%FT%TZ)" >> "$LOG"
