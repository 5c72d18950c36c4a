#!/bin/bash
# Round-4 session-5 part 2: waits for run_session5.sh (pid arg) to exit, then
#   1. CenterPoint NaN diag rerun (the session-5 copy was killed in the
#      duplicate-queue cleanup) — validates commit 76d4dc8 on chip
#   2. lever sweep with trace device times (tools/run_lever_sweep.sh)
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session6.log
mkdir -p "$OUT"

PREV=${1:-}
if [ -n "$PREV" ]; then
  while kill -0 "$PREV" 2>/dev/null; do sleep 20; done
fi

touch "$OUT/TPU_BENCH_RUNNING"
echo "session6 start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

echo "== DIAG_cp_nan2 start $(date -u +%FT%TZ)" >> "$LOG"
timeout 3600 python -m robustpointclouds_tpu.tools.diag_centerpoint_nan \
  > "$OUT/DIAG_cp_nan2.out" 2> "$OUT/DIAG_cp_nan2.err"
echo "== DIAG_cp_nan2 rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
tail -c 1500 "$OUT/DIAG_cp_nan2.out" >> "$LOG"

LEVER_PREDISP=0 bash tools/run_lever_sweep.sh
echo "session6 done $(date -u +%FT%TZ)" >> "$LOG"
