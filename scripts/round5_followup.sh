#!/bin/bash
# Round-5 follow-up: after the recovery queue drains, pin the protein_g
# Langevin discrepancy (PERF_NOTES "Round 5": 24.16 vs 34.19 steps/s at
# parallel_sim=1000) on the then-idle chip. Runs under the chip lock and
# yields to a waiting bench between (short, non-resumable) measurements.
set -ux
cd /root/repo
T=/tmp

QUEUE_PID=$(tr -dc 0-9 < $T/r5_queue2.pid 2>/dev/null)
[ -n "$QUEUE_PID" ] && while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 60; done
while ps -eo cmd | grep -E "round5_recovery_queue" | grep -vq grep; do sleep 60; done

# chip free + no bench waiting
while [ -e .controls/CHIP_LOCK ]; do
  pid=$(head -1 .controls/CHIP_LOCK 2>/dev/null | tr -dc 0-9)
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || { rm -f .controls/CHIP_LOCK; break; }
  sleep 30
done
while [ -e .controls/BENCH_WAITING ]; do sleep 15; done

mkdir -p .controls
echo $$ > .controls/CHIP_LOCK
trap 'rm -f .controls/CHIP_LOCK' EXIT
timeout 3000 python -u scripts/pin_proteing.py > $T/r5_pin_proteing.json 2> $T/r5_pin_proteing.log
echo "pin rc=$?" >> $T/r5_pin_proteing.log
rm -f .controls/CHIP_LOCK
echo FOLLOWUP5_DONE
