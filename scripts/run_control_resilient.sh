#!/bin/bash
# Run a production control with crash resilience: each attempt resumes from
# the last checkpoint milestone (scripts/chain10_control.py --resume), so a
# TPU-worker crash or RPC hang costs at most one eval_interval of training
# plus the timed-out remainder of the attempt. Before every attempt a cheap
# subprocess probe (`jax.devices()`) waits out TPU-pool outages, so attempts
# are only spent on runs that actually reached the device — a multi-hour
# pool outage no longer exhausts the attempt budget. Usage:
#     run_control_resilient.sh <n_beads> [attempts] [per_attempt_timeout_s] [probe_deadline_s]
set -u
N=$1
ATTEMPTS=${2:-6}
PER_TIMEOUT=${3:-9000}
PROBE_DEADLINE=${4:-28800}   # give up probing after 8 h of continuous outage
cd "$(dirname "$0")/.."
# Default the checkpoint folder into the repo (not /tmp) so a partially
# trained control survives round/driver restarts and resumes next session.
FOLDER=${CONTROL_FOLDER:-$(pwd)/.controls/chain${N}_run}
mkdir -p "$FOLDER"

# Advisory chip lock: bench.py waits while the holder pid is alive, so a
# driver bench cannot measure against this run (BENCH_r03 incident).
mkdir -p "$(pwd)/.controls"
LOCK="$(pwd)/.controls/CHIP_LOCK"
# Bench-preemption flag (twoforone_tpu/utils/preempt.py protocol): bench.py
# touches this before waiting on the lock; the Python control checks it at
# lossless boundaries (train milestones, cached post-train stages) and
# exits 75; we then release the lock until the bench clears the flag —
# so a control can never starve the round-end bench (BENCH_r04 rc=124).
FLAG="$(pwd)/.controls/BENCH_WAITING"
export TWOFORONE_PREEMPT_FLAG="$FLAG"
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT

yield_to_bench() {
    # Release the chip while a bench is waiting; re-acquire when done.
    [ -e "$FLAG" ] || return 0
    echo "=== bench waiting — released chip lock $(date -u +%H:%M:%S) ===" >&2
    rm -f "$LOCK"
    while [ -e "$FLAG" ]; do
        # Staleness bail-out: a bench that crashed without removing its
        # flag must not park the control forever.
        local age=$(( $(date +%s) - $(stat -c %Y "$FLAG" 2>/dev/null || date +%s) ))
        if [ "$age" -ge "${BENCH_FLAG_STALE_S:-3600}" ]; then
            echo "=== bench flag stale (${age}s) — clearing it ===" >&2
            rm -f "$FLAG"
            break
        fi
        sleep 15
    done
    echo $$ > "$LOCK"
    echo "=== bench done — re-acquired chip lock $(date -u +%H:%M:%S) ===" >&2
}

wait_for_backend() {
    # Probe in a subprocess (a failed in-process init is cached by jax).
    # When the pool is DOWN, backend init hangs in internal retries for
    # ~25 min before raising UNAVAILABLE — so the probe must wait past
    # that (1800 s) to get a real verdict. A probe that still hangs at
    # 1800 s (rc=124) is treated as an outage too: control runs are
    # serialized (watchers), so nothing of ours can legitimately hold the
    # claim that long before this launcher starts.
    local start=$SECONDS
    while true; do
        # Probe an actual computation, not just device enumeration: a
        # wedged tunnel can keep serving jax.devices() (client handshake)
        # while every compute RPC hangs forever (observed 2026-08-20:
        # devices() instant, a 512x512 matmul hung until timeout — four
        # consecutive attempts wedged at their first device op after a
        # green devices() probe).
        timeout 1800 /opt/venv/bin/python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()" \
            >/dev/null 2>&1
        local rc=$?
        if [ "$rc" -eq 0 ]; then
            return 0
        fi
        if [ $((SECONDS - start)) -ge "$PROBE_DEADLINE" ]; then
            echo "=== backend still unavailable after ${PROBE_DEADLINE}s of probing ===" >&2
            return 1
        fi
        echo "=== backend unavailable (rc=$rc) $(date -u +%H:%M:%S); re-probing in 60 s ===" >&2
        sleep 60
    done
}

# Output-stall watchdog: every phase of a control run prints at least once
# every few minutes (train step lines, sample_from_model heartbeat batches,
# Langevin log lines), so a log that stops growing for STALL_S seconds means
# a wedged TPU RPC (futex-wait forever; observed on tunnel outages), not a
# slow phase. Killing the attempt early lets the resume machinery retry in
# minutes instead of burning the full PER_TIMEOUT. Generous threshold: cold
# Mosaic/XLA compiles at new shapes can run ~3-10 min silent.
STALL_S=${STALL_S:-1200}
OUT_FILE=$(readlink -f /proc/$$/fd/1 2>/dev/null || true)

run_attempt() {
    # CONTROL_CMD: run an arbitrary resumable chip workload (e.g.
    # scripts/paper_scale_langevin.py) under this launcher's chip-lock /
    # bench-preemption / stall-watchdog / retry machinery instead of the
    # default control training. The command must be idempotent under
    # relaunch (resume from its own persisted state) and honor
    # TWOFORONE_PREEMPT_FLAG. Word-split on purpose.
    if [ -n "${CONTROL_CMD:-}" ]; then
        timeout "$PER_TIMEOUT" ${CONTROL_CMD} ${CONTROL_EXTRA:-} &
    else
    timeout "$PER_TIMEOUT" /opt/venv/bin/python -u scripts/chain10_control.py \
        --n_beads "$N" --results_folder "$FOLDER" --resume \
        ${CONTROL_EXTRA:-} &
    fi
    local pid=$!
    if [ -n "$OUT_FILE" ] && [ -f "$OUT_FILE" ]; then
        while kill -0 "$pid" 2>/dev/null; do
            sleep 60
            local age=$(( $(date +%s) - $(stat -c %Y "$OUT_FILE" 2>/dev/null || date +%s) ))
            if [ "$age" -ge "$STALL_S" ]; then
                echo "=== no output for ${age}s — killing wedged attempt ===" >&2
                kill "$pid" 2>/dev/null
                break
            fi
        done
    fi
    wait "$pid"
}

i=1
while [ "$i" -le "$ATTEMPTS" ]; do
    yield_to_bench
    wait_for_backend || exit 1
    echo "=== attempt $i/$ATTEMPTS $(date -u +%H:%M:%S) ==="
    # CONTROL_EXTRA: extra chain10_control.py flags (e.g. a train_iter
    # extension or tuned Langevin knobs), word-split on purpose.
    run_attempt && exit 0
    rc=$?
    if [ "$rc" -eq 75 ]; then
        # Bench preemption (EX_TEMPFAIL): the run checkpointed and yielded.
        # Pause, then resume WITHOUT consuming an attempt.
        yield_to_bench
        continue
    fi
    echo "=== attempt $i exited rc=$rc; retrying in 120 s ===" >&2
    i=$((i + 1))
    sleep 120
done
echo "=== all $ATTEMPTS attempts failed ===" >&2
exit 1
