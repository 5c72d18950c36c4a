#!/bin/bash
# Round-5 session C (after run_session_r5b.sh): the compact-point adversary
# (RPC_COMPACT_PERT) on all three families, then a final driver-default
# bench.py warm. bf16 adversary is the code default by now.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session_r5c.log
mkdir -p "$OUT"
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "lock exists — refusing to start" >&2
  exit 1
fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session_r5c start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "== $name rc=$rc end $(date -u +%FT%TZ)" >> "$LOG"
  [ "$rc" = "124" ] && echo "== $name TIMEOUT (rc=124): measurement truncated, not a variant failure" >> "$LOG"
  tail -c 1400 "$OUT/$name.out" >> "$LOG"
}

lever() {
  local name=$1 tmo=$2; shift 2
  run "LEVER_$name" "$tmo" env RPC_VAR_NAME="$name" RPC_VAR_TRACE=1 RPC_VAR_FINGERPRINT=1 "$@" \
    python -m robustpointclouds_tpu.tools.bench_one_variant
}

lever r5_compact 3300 env RPC_VAR_PLAN=1 RPC_VAR_PERT_BF16=1 RPC_VAR_COMPACT=1
run LEVER_r5_pillars_compact 2400 env BENCH_TRACE=1 RPC_COMPACT_PERT=1 \
  python -m robustpointclouds_tpu.tools.bench_pointpillars
run BENCH_r5_centerpoint_compact 3300 env BENCH_TRACE=1 RPC_COMPACT_PERT=1 \
  python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_r5_warm2 2400 env RPC_SUITE_OWNER=1 python bench.py

echo "session_r5c done $(date -u +%FT%TZ)" >> "$LOG"
