#!/bin/bash
# Round-4 session-4/5: plan-schedule lever sweep, ONE PROCESS PER VARIANT.
# The round-3 lever verdicts were taken with the sorts on-device; under the
# round-3b host-plan schedule the device schedule changed wholesale, so every
# gated lever is re-measured here. Each variant runs in its own process
# because the axon runtime's resident-plan handling is process-state
# dependent (PARITY.md round-4 diagnosis). Two robustness measures vs v1:
#   - RPC_VAR_TRACE=1: each variant also runs once under jax.profiler.trace
#     and reports device_step_ms from the trace's device plane — immune to
#     the resident-plan wall-clock pathology (25 s/step wall, 222 ms device).
#   - RPC_VAR_PREDISP (set below per the diag_plan_bisect verdict): load and
#     fire a per-dispatch step executable before the scan.
# Sequential by design (1-core host). Lock protocol shared with the suite.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/lever_sweep.log
mkdir -p "$OUT"
touch "$OUT/TPU_BENCH_RUNNING"
echo "lever sweep start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

PREDISP=${LEVER_PREDISP:-0}

run() {
  local name=$1; shift
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout 3600 env RPC_VAR_NAME="$name" RPC_VAR_TRACE=1 RPC_VAR_PREDISP="$PREDISP" "$@" \
    python -m robustpointclouds_tpu.tools.bench_one_variant \
    > "$OUT/LEVER_$name.out" 2> "$OUT/LEVER_$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
  cat "$OUT/LEVER_$name.out" >> "$LOG"
}

# baseline reproduction of the suite's plan number (process-shape control)
run plan_base       env RPC_VAR_PLAN=1
# inline control in the same process shape (device_step_ms denominator)
run inline_base     env RPC_VAR_PLAN=0
run plan_save_col   env RPC_VAR_PLAN=1 RPC_VAR_SAVE_COL=1
run plan_dw_gcol    env RPC_VAR_PLAN=1 RPC_VAR_DW_GCOL=1
run plan_dense      env RPC_VAR_PLAN=1 RPC_VAR_DENSE_GATHER=1
run plan_fpn_d2s    env RPC_VAR_PLAN=1 RPC_VAR_FPN_D2S=1
run plan_dev_assign env RPC_VAR_PLAN=1 RPC_VAR_ASSIGN=0
run plan_B12        env RPC_VAR_PLAN=1 RPC_VAR_B=12
run plan_wide64     env RPC_VAR_PLAN=1 RPC_VAR_MAX_CIN=64 RPC_VAR_XWIN_SPLIT=32

# pillar family with the same trace-device-time methodology
pill() {
  local name=$1; shift
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout 3600 env BENCH_TRACE=1 "$@" \
    python -m robustpointclouds_tpu.tools.bench_pointpillars \
    > "$OUT/LEVER_$name.out" 2> "$OUT/LEVER_$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
  cat "$OUT/LEVER_$name.out" >> "$LOG"
}
pill pillars_plan   env
pill pillars_inline env BENCH_NO_PLAN=1

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "lever sweep done $(date -u +%FT%TZ)" >> "$LOG"
