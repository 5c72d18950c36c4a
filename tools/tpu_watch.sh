#!/bin/bash
# Round-4 TPU watch loop (CLAUDE.md pattern): retry jax.devices() until the
# axon tunnel initializes, then run the session-3 measurement suite
# (tools/run_bench_suite3.sh) from the repo HEAD. Results land in work_dirs/.
#
# Lock protocol: work_dirs/TPU_BENCH_RUNNING exists while the suite runs —
# do not start other compile-heavy processes (1-core host). If the lock
# already exists when the probe succeeds, another runner owns the suite —
# this loop just exits.
set -u
cd /root/repo
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

if [ -e "$OUT/TPU_BENCH_RUNNING" ]; then
  echo "TPU UP $(date -u +%FT%TZ) but suite lock held - exiting" >> "$LOG"
  exit 0
fi
# Round-boundary guard (VERDICT r4 item 8): if work_dirs/ROUND_DEADLINE
# holds an epoch-seconds deadline, refuse to start a suite whose worst-case
# duration (SUITE_WORST_S, default 2h) would cross it — a suite that outruns
# the round contends with the driver's bench capture and loses the round's
# recorded number (that killed BENCH_r04).
SUITE=${SUITE:-/root/repo/tools/run_bench_suite3.sh}
SUITE_WORST_S=${SUITE_WORST_S:-7200}
if [ -f "$OUT/ROUND_DEADLINE" ]; then
  deadline=$(cat "$OUT/ROUND_DEADLINE")
  now=$(date +%s)
  if [ $((now + SUITE_WORST_S)) -gt "$deadline" ]; then
    echo "TPU UP $(date -u +%FT%TZ) but worst-case suite end crosses ROUND_DEADLINE - exiting" >> "$LOG"
    exit 0
  fi
fi
echo "TPU UP $(date -u +%FT%TZ) - running $SUITE" >> "$LOG"
bash "$SUITE"
