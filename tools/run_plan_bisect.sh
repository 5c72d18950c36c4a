#!/bin/bash
# Bisect the plan-fed train-scan pathology (diag_plan_bisect.py docstring):
# one variant per process, sequential (1-core host + exclusive TPU).
# Run AFTER run_bench_suite3.sh releases the lock.
set -u
cd /root/repo
OUT=/root/repo/work_dirs
LOG=$OUT/plan_bisect.log
mkdir -p "$OUT"
touch "$OUT/TPU_BENCH_RUNNING"
echo "plan bisect start $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" >> "$LOG"

for v in pure vperturb donate builder4 predisp full; do
  echo "== $v start $(date -u +%FT%TZ)" >> "$LOG"
  timeout 3600 env DIAG_VARIANT=$v python -m robustpointclouds_tpu.tools.diag_plan_bisect \
    > "$OUT/BISECT_$v.out" 2> "$OUT/BISECT_$v.err"
  echo "== $v rc=$? end $(date -u +%FT%TZ)" >> "$LOG"
  cat "$OUT/BISECT_$v.out" >> "$LOG"
done

rm -f "$OUT/TPU_BENCH_RUNNING"
echo "plan bisect done $(date -u +%FT%TZ)" >> "$LOG"
