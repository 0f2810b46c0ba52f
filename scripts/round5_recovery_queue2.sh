#!/bin/bash
# Round-5 recovery queue, v2. Supersedes round5_recovery_queue.sh after the
# chain28 relaunch showed the TPU tunnel wedging roughly hourly (attempts
# killed by the stall watchdog after ~1200 s of silence, resume lossless).
# v2 therefore (a) supervises the chain28 launcher — if it exhausts its
# attempt budget before the control finishes, it is relaunched (resume
# costs nothing) rather than abandoned; (b) runs every non-resumable step
# under run_control_resilient.sh's stall-watchdog/retry machinery instead
# of a bare `timeout`, now that ddim_quality.py prints per-batch
# heartbeats; (c) folds in the protein_g bench-leg pin. Chip workloads in
# value order:
#
#   0. chain28 full control to completion (supervised relaunch)
#   1. paper-scale chignolin Langevin 100x6M with deliberate mid-run kills
#      (PER_TIMEOUT=1200) — the production kill/resume demo
#   2. bf16-vs-f32 ancestral iid quality A/B, chain20/chain35, 100k
#   3. builder-side bench record
#   4. protein_g parallel_sim=1000 pin (PERF_NOTES round-5 open item)
set -ux
cd /root/repo
T=/tmp

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

launcher_running() {
  ps -eo cmd | grep -E "run_control_resilient.sh" | grep -vq grep
}

# 0. chain28 to completion. The launcher currently running (started
# separately) resumes across attempts; if it dies with the control still
# unfinished (no results.json) and unstaged, relaunch it — up to 3 more
# launcher rounds of 10 attempts each.
C28_ROUNDS=0
while true; do
  if launcher_running; then sleep 60; continue; fi
  [ -e twoforone_tpu/assets/trained/chain28/results.json ] && break
  [ -e .controls/chain28_run/results.json ] && break  # finished, bars failed: stop, needs judgment
  [ "$C28_ROUNDS" -ge 3 ] && break
  C28_ROUNDS=$((C28_ROUNDS + 1))
  wait_lock_free
  CONTROL_EXTRA="--langevin_dt_scale 0.35 --langevin_steps 250000" \
    STALL_S=900 bash scripts/run_control_resilient.sh 28 10 9000 \
    >> $T/r5_c28.log 2>&1
  echo "chain28 relaunch round $C28_ROUNDS rc=$?"
done

# 1. paper-scale production workload, deliberately killed every 1200 s.
wait_lock_free
CONTROL_CMD="/opt/venv/bin/python -u scripts/paper_scale_langevin.py" \
  bash scripts/run_control_resilient.sh 10 14 1200 > $T/r5_paper_scale.log 2>&1
echo "paper scale rc=$?"

# 2. bf16 iid quality vs f32 at 100k samples. Non-resumable but cheap to
# retry from scratch; per-batch heartbeats let the stall watchdog kill a
# wedged RPC in ~15 min instead of losing the full draw to a bare timeout.
for N in 20 35; do
  for MODE in f32 bf16; do
    wait_lock_free
    wait_bench_clear
    EXTRA=""; [ "$MODE" = bf16 ] && EXTRA="--bf16"
    CONTROL_CMD="/opt/venv/bin/python -u scripts/ddim_quality.py --n_beads $N --ancestral $EXTRA --steps 100 --num_samples 100000 --out $T/r5_iid_${MODE}_c${N}.json" \
      STALL_S=900 bash scripts/run_control_resilient.sh 0 3 9000 \
      >> $T/r5_bf16_quality.log 2>&1
    echo "$MODE c$N rc=$?" >> $T/r5_bf16_quality.log
  done
done

# 3. builder-side bench record (prints heartbeat per leg; resumption is
# cheap, so the same watchdog applies).
wait_lock_free
wait_bench_clear
TWOFORONE_CHIP_LOCK_OK=1 CONTROL_CMD="/opt/venv/bin/python -u bench.py" \
  STALL_S=1200 bash scripts/run_control_resilient.sh 0 2 3600 > $T/r5_bench.log 2>&1
echo "bench rc=$?"

# 4. protein_g bench-leg pin on the now-idle chip.
wait_lock_free
wait_bench_clear
CONTROL_CMD="/opt/venv/bin/python -u scripts/pin_proteing.py" STALL_S=900 \
  bash scripts/run_control_resilient.sh 0 3 3000 > $T/r5_pin_proteing.log 2>&1
echo "pin rc=$?"
echo QUEUE5R2_DONE
