#!/bin/bash
# Round-5 session B (run after run_session_r5a.sh releases the lock):
#   1. levers RE-OPENED by COL3 (round-3 verdicts were taken with the flat
#      col + retile schedule): dW-from-g-col, and 64ch xwin with split
#      halves feeding separate dots (no concat in the COL3 form)
#   2. pillar family with the full bf16 point-stage (perturber + BN stats)
#   3. CenterPoint plan-fed step + trace (first ever; VERDICT item 4)
#   4. the convergence artifact (VERDICT item 5): 2000 full-scale steps
#   5. final bench.py re-warm so the driver's end-of-round capture compiles
#      from cache (exact default flags)
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session_r5b.log
mkdir -p "$OUT"
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "lock exists — refusing to start" >&2
  exit 1
fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session_r5b start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

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

# session-A verdict: col3 LOSES at the step level (214.2 vs 199.0 base —
# the retiles it removes were overlapping other work); bf16 adversary wins
# ~6 ms. Measure bf16 WITHOUT col3, + the BN-stats read-width lever, + the
# dW-from-g-col re-measure under the plan+E1 schedule.
lever r5_bf16     3300 env RPC_VAR_PLAN=1 RPC_VAR_PERT_BF16=1
lever r5_bf16_bn  3300 env RPC_VAR_PLAN=1 RPC_VAR_PERT_BF16=1 RPC_BN_BF16_STATS=1
lever r5_bf16_dwg 3300 env RPC_VAR_PLAN=1 RPC_VAR_PERT_BF16=1 RPC_VAR_DW_GCOL=1
run LEVER_r5_pillars_bn 2400 env BENCH_TRACE=1 RPC_PERT_BF16=1 RPC_BN_BF16_STATS=1 \
  python -m robustpointclouds_tpu.tools.bench_pointpillars
run BENCH_r5_centerpoint 3300 env BENCH_TRACE=1 \
  python -m robustpointclouds_tpu.tools.bench_centerpoint
run CONVERGENCE_r5 5400 python -m robustpointclouds_tpu.tools.convergence_run 2000
run BENCH_r5_warm 2400 env RPC_SUITE_OWNER=1 python bench.py

echo "session_r5b done $(date -u +%FT%TZ)" >> "$LOG"
