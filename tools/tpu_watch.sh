#!/bin/bash
# Round-4 TPU watch loop (CLAUDE.md pattern): retry jax.devices() until the
# axon tunnel initializes, then immediately run the full measurement suite
# from the pinned bench worktree (.bench_wt @ the round-3 HEAD) so in-flight
# round-4 edits cannot perturb the measurement. Results land in work_dirs/.
#
# Lock protocol: work_dirs/TPU_BENCH_RUNNING exists while the suite runs —
# do not start other compile-heavy processes (1-core host).
set -u
cd /root/repo
WT=/root/repo/.bench_wt
OUT=/root/repo/work_dirs
LOG=$OUT/tpu_watch.log
mkdir -p "$OUT"
echo "watch start $(date -u +%FT%TZ) pid=$$" >> "$LOG"

while true; do
  if timeout 300 python - >> "$LOG" 2>&1 <<'EOF'
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", f"cpu only: {ds}"
print("TPU UP:", ds)
EOF
  then
    break
  fi
  echo "probe failed $(date -u +%FT%TZ)" >> "$LOG"
  sleep 240
done

echo "TPU UP $(date -u +%FT%TZ) - running bench suite from $WT" >> "$LOG"
touch "$OUT/TPU_BENCH_RUNNING"
cd "$WT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name start $(date -u +%FT%TZ)" >> "$LOG"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "== $name rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
}

run BENCH_plan    5400  python bench.py
run BENCH_noplan  5400  env BENCH_NO_PLAN=1 python bench.py
run BENCH_r4_step 14400 python -m robustpointclouds_tpu.tools.bench_r4_step
run BENCH_pillars 7200  python -m robustpointclouds_tpu.tools.bench_pointpillars
run BENCH_centerpoint 7200 python -m robustpointclouds_tpu.tools.bench_centerpoint
run BENCH_inference 7200 python -m robustpointclouds_tpu.tools.bench_inference

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "bench suite done $(date -u +%FT%TZ)" >> "$LOG"
