#!/bin/bash
# Round-5 session G: FPN depth-to-space form under the plan+bf16 schedule —
# the one unmeasured lever that sits ON the serial critical path
# (backbone -> FPN -> head), where component wins can actually move the step.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session_r5g.log
mkdir -p "$OUT"
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then echo "lock exists" >&2; exit 1; fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session_r5g start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"
run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "== $name rc=$rc end $(date -u +%FT%TZ)" >> "$LOG"
  tail -c 1200 "$OUT/$name.out" >> "$LOG"
}
run LEVER_r5_fpn_d2s 3300 env RPC_VAR_NAME=r5_fpn_d2s RPC_VAR_TRACE=1 RPC_VAR_FINGERPRINT=1 \
  RPC_VAR_PLAN=1 RPC_VAR_PERT_BF16=1 RPC_VAR_FPN_D2S=1 \
  python -m robustpointclouds_tpu.tools.bench_one_variant
run BENCH_r5_warm6 2400 env RPC_SUITE_OWNER=1 python bench.py
echo "session_r5g done $(date -u +%FT%TZ)" >> "$LOG"
