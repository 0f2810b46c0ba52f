#!/bin/bash
# Run a production control with crash resilience: each attempt resumes from
# the last checkpoint milestone (scripts/chain10_control.py --resume), so a
# TPU-worker crash or RPC hang costs at most one eval_interval of training
# plus the timed-out remainder of the attempt. Usage:
#     run_control_resilient.sh <n_beads> [attempts] [per_attempt_timeout_s]
set -u
N=$1
ATTEMPTS=${2:-6}
PER_TIMEOUT=${3:-9000}
cd "$(dirname "$0")/.."
FOLDER=/tmp/chain${N}_run
for i in $(seq 1 "$ATTEMPTS"); do
    echo "=== attempt $i/$ATTEMPTS $(date -u +%H:%M:%S) ==="
    timeout "$PER_TIMEOUT" /opt/venv/bin/python -u scripts/chain10_control.py \
        --n_beads "$N" --results_folder "$FOLDER" --resume && exit 0
    rc=$?
    echo "=== attempt $i exited rc=$rc; retrying in 120 s ===" >&2
    sleep 120
done
echo "=== all $ATTEMPTS attempts failed ===" >&2
exit 1
