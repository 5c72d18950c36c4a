#!/bin/bash
# Round-5 session E (final): the convergence artifact with the reference's
# freeze-detector attack-strengthening phase, then the last driver warm.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session_r5e.log
mkdir -p "$OUT"
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "lock exists — refusing to start" >&2
  exit 1
fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session_r5e start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "== $name rc=$rc end $(date -u +%FT%TZ)" >> "$LOG"
  [ "$rc" = "124" ] && echo "== $name TIMEOUT (rc=124)" >> "$LOG"
  tail -c 1600 "$OUT/$name.out" >> "$LOG"
}

run CONVERGENCE_r5_freeze 5400 env CONV_FREEZE_STEPS=600 \
  python -m robustpointclouds_tpu.tools.convergence_run 2000
run BENCH_r5_warm4 2400 env RPC_SUITE_OWNER=1 python bench.py

echo "session_r5e done $(date -u +%FT%TZ)" >> "$LOG"
