#!/bin/bash
# Round-5 session A: measure the attribution-driven levers (PARITY.md
# round-5 section) on chip, one variant per process, device time from the
# xplane trace. Ordering: bench.py first (warms the driver's exact default
# module in .jax_cache — the driver's capture is the round's primary
# deliverable, VERDICT r5 item 1), then the lever ladder base -> col3 ->
# col3+bf16, then the pillar family re-measure.
#
# Lock hygiene (VERDICT r4 item 8 + ADVICE): bail if a lock already exists;
# remove ours on ANY exit via trap.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session_r5a.log
mkdir -p "$OUT"
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "lock $OUT/TPU_BENCH_RUNNING exists — another suite owns the chip; refusing to start" >&2
  exit 1
fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session_r5a start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "== $name rc=$rc end $(date -u +%FT%TZ)" >> "$LOG"
  [ "$rc" = "124" ] && echo "== $name TIMEOUT (rc=124): measurement truncated, not a variant failure" >> "$LOG"
  tail -c 1200 "$OUT/$name.out" >> "$LOG"
}

lever() {
  local name=$1 tmo=$2; shift 2
  run "LEVER_$name" "$tmo" env RPC_VAR_NAME="$name" RPC_VAR_TRACE=1 RPC_VAR_FINGERPRINT=1 "$@" \
    python -m robustpointclouds_tpu.tools.bench_one_variant
}

# 1. driver-cache warm + the honest inline number with the E1 rewrites
run BENCH_r5_default 2400 env RPC_SUITE_OWNER=1 python bench.py
# 2. lever ladder (plan schedule, device-plane verdicts)
lever r5_base      3300 env RPC_VAR_PLAN=1
lever r5_col3      3300 env RPC_VAR_PLAN=1 RPC_VAR_COL3=1
lever r5_col3bf16  3300 env RPC_VAR_PLAN=1 RPC_VAR_COL3=1 RPC_VAR_PERT_BF16=1
# 3. pillar family with the E1 rewrites + bf16 adversary
run LEVER_r5_pillars 2400 env BENCH_TRACE=1 RPC_PERT_BF16=1 \
  python -m robustpointclouds_tpu.tools.bench_pointpillars
# 4. inline step with all round-5 levers (bench.py form, env-gated)
run BENCH_r5_inline_levers 2400 env RPC_SUITE_OWNER=1 RPC_COL3=1 RPC_PERT_BF16=1 python bench.py

echo "session_r5a done $(date -u +%FT%TZ)" >> "$LOG"
