#!/bin/bash
# Serialize production-control runs behind an already-running launcher:
# wait for the given PID (a run_control_resilient.sh instance) to exit,
# then run the listed bead counts one after another. Keeps the single
# TPU chip claimed by at most one control run at a time.
#     queue_controls.sh <wait_pid> <n_beads>...
set -u
WAIT_PID=$1
shift
cd "$(dirname "$0")/.."
while kill -0 "$WAIT_PID" 2>/dev/null; do
    sleep 60
done
# Inter-run TPU window: driver compile gate + strided-solver bench (~10 min)
timeout 1800 /opt/venv/bin/python -u scripts/tpu_gates_and_dpm_bench.py \
    || echo "=== queue: gate script failed (continuing) ==="
for N in "$@"; do
    echo "=== queue: starting chain${N} $(date -u +%H:%M:%S) ==="
    bash scripts/run_control_resilient.sh "$N"
    echo "=== queue: chain${N} exited rc=$? ==="
done
