#!/bin/bash
# Round-5 session D: CenterPoint remat-policy variant (skip re-running the
# encoder gathers in the backward) + serving-latency re-measure with the
# round-5 defaults (one-hot losses + bf16 adversary), + a final driver warm.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session_r5d.log
mkdir -p "$OUT"
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "lock exists — refusing to start" >&2
  exit 1
fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session_r5d start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "== $name rc=$rc end $(date -u +%FT%TZ)" >> "$LOG"
  [ "$rc" = "124" ] && echo "== $name TIMEOUT (rc=124)" >> "$LOG"
  tail -c 1400 "$OUT/$name.out" >> "$LOG"
}

run BENCH_r5_cp_dots 3300 env BENCH_TRACE=1 RPC_CP_REMAT=dots \
  python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_r5_inference 2400 \
  python -m robustpointclouds_tpu.tools.bench_inference
run BENCH_r5_warm3 2400 env RPC_SUITE_OWNER=1 python bench.py

echo "session_r5d done $(date -u +%FT%TZ)" >> "$LOG"
