#!/bin/bash
# Round-5 session F: B=12 plan re-measure under the round-5 code (the
# round-4 537 ms number predates the one-hot/bf16 rewrites), final warm.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session_r5f.log
mkdir -p "$OUT"
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "lock exists — refusing to start" >&2
  exit 1
fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session_r5f start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"
run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "== $name rc=$rc end $(date -u +%FT%TZ)" >> "$LOG"
  [ "$rc" = "124" ] && echo "== $name TIMEOUT (rc=124)" >> "$LOG"
  tail -c 1400 "$OUT/$name.out" >> "$LOG"
}
run LEVER_r5_B12 3300 env RPC_VAR_NAME=r5_B12 RPC_VAR_TRACE=1 RPC_VAR_FINGERPRINT=1 \
  RPC_VAR_PLAN=1 RPC_VAR_PERT_BF16=1 RPC_VAR_B=12 \
  python -m robustpointclouds_tpu.tools.bench_one_variant
run BENCH_r5_warm5 2400 env RPC_SUITE_OWNER=1 python bench.py
echo "session_r5f done $(date -u +%FT%TZ)" >> "$LOG"
