#!/bin/bash
# Round-5 follower: after the recovery queue (round5_recovery_queue2.sh)
# drains, backfill the ergodicity report for the three staged controls
# that predate it (chain10/chain20/chain35 — scripts/backfill_ergodicity.py).
# Ordered cheapest-first so a round-end driver bench preempts at most the
# longest leg; every leg is segment-checkpointed and preemption-aware.
set -ux
cd /root/repo
T=/tmp

wait_queue2_done() {
  while ps -eo cmd | grep -E "round5_recovery_queue2.sh" | grep -vq grep; do
    sleep 60
  done
}

wait_lock_free() {
  local LOCK=.controls/CHIP_LOCK
  while [ -e "$LOCK" ]; do
    local pid
    pid=$(head -1 "$LOCK" 2>/dev/null | tr -dc 0-9)
    [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || { rm -f "$LOCK"; break; }
    sleep 30
  done
}

wait_bench_clear() {
  while [ -e .controls/BENCH_WAITING ]; do sleep 15; done
}

wait_queue2_done

# 0. Paper-scale completion net: if the recovery queue's paper-scale leg
# exhausted its attempt budget during the 2026-08-20 tunnel outage (compute
# RPCs wedged while jax.devices() kept answering, so the old probe let
# attempts start and burn), finish it here — the run resumes losslessly
# from its segment state, and run_control_resilient.sh now probes a real
# computation so attempts only start on a genuinely healthy backend.
if [ ! -e .controls/paper_scale_run/results.json ]; then
  wait_lock_free
  wait_bench_clear
  CONTROL_CMD="/opt/venv/bin/python -u scripts/paper_scale_langevin.py" \
    bash scripts/run_control_resilient.sh 10 14 1200 \
    >> $T/r5_paper_scale.log 2>&1
  echo "paper scale (follower) rc=$?"
fi

for N in 10 20 35; do
  wait_lock_free
  wait_bench_clear
  CONTROL_CMD="/opt/venv/bin/python -u scripts/backfill_ergodicity.py --n_beads $N" \
    STALL_S=900 bash scripts/run_control_resilient.sh 0 3 3000 \
    > $T/r5_backfill_c$N.log 2>&1
  echo "backfill c$N rc=$?"
done
echo BACKFILL_QUEUE_DONE
