#!/bin/bash
# Round-4 session-8 (fresh host, empty .jax_cache, tunnel UP at start):
# prioritized single-pass capture of everything still missing from the
# round-4 measurement plan, most valuable first, each item bounded.
#   1. bench.py           — inline flagship number AND warms .jax_cache so
#                           the driver's end-of-round BENCH_r04 capture
#                           compiles from cache instead of cold (round-3's
#                           record was lost to exactly this kind of fragility)
#   2. plan_base/inline_base (trace) — device_step_ms pair that substantiates
#                           "plan train wins on the device plane"
#   3. bench_inference    — fetch-based timer re-validation of the 1.92x
#                           serving headline (session-7 queue, never ran)
#   4. bench_centerpoint  — first post-NaN-fix CP train number (fetch timer)
#   5. remaining plan-schedule levers + pillar plan trace, time permitting
# Sequential by design (1-core host). Lock protocol shared with the suite.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/session8.log
mkdir -p "$OUT"
# lock hygiene retrofitted post-run (ADVICE r4): bail if another suite owns
# the chip; trap-remove our lock on ANY exit, not just the happy path
if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "lock exists — refusing to start" >&2
  exit 1
fi
touch "$OUT/TPU_BENCH_RUNNING"
trap 'rm -f "$OUT/TPU_BENCH_RUNNING"' EXIT
echo "session8 start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
  tail -c 1200 "$OUT/$name.out" >> "$LOG"
}

lever() {
  local name=$1 tmo=$2; shift 2
  run "LEVER_$name" "$tmo" env RPC_VAR_NAME="$name" RPC_VAR_TRACE=1 "$@" \
    python -m robustpointclouds_tpu.tools.bench_one_variant
}

run BENCH_default 1800 python bench.py
lever plan_base   1500 env RPC_VAR_PLAN=1
lever inline_base 1500 env RPC_VAR_PLAN=0
run BENCH_inference4   1800 python -m robustpointclouds_tpu.tools.bench_inference
run BENCH_centerpoint4 1500 python -m robustpointclouds_tpu.tools.bench_centerpoint
lever plan_save_col 1200 env RPC_VAR_PLAN=1 RPC_VAR_SAVE_COL=1
lever plan_dense    1200 env RPC_VAR_PLAN=1 RPC_VAR_DENSE_GATHER=1
lever plan_B12      1500 env RPC_VAR_PLAN=1 RPC_VAR_B=12
lever plan_dev_assign 1200 env RPC_VAR_PLAN=1 RPC_VAR_ASSIGN=0
run LEVER_pillars_plan 1200 env BENCH_TRACE=1 \
  python -m robustpointclouds_tpu.tools.bench_pointpillars

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "session8 done $(date -u +%FT%TZ)" >> "$LOG"
