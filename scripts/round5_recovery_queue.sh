#!/bin/bash
# Round-5 recovery queue (fresh machine: /tmp and .controls from the
# previous session are gone). Serialized chip workloads, in value order:
#
#   [already launched separately] chain28 full control — train 50k +
#       Langevin 250k @ dt_scale 0.35 (the follower-queue retry knobs:
#       at 0.5 the 150k window measured occupancy error 0.1031, 3% over
#       the 0.10 bar and GROWING with window length — BAOAB stationary
#       bias ~ dt^2, so the fix is a smaller step; 250k steps keep the
#       hop fraction above bar at the slower per-step diffusion)
#   1. paper-scale chignolin Langevin 100x6M with deliberate mid-run
#      kills (PER_TIMEOUT=1200) — the production kill/resume demo
#   2. bf16-vs-f32 ancestral iid quality A/B, chain20/chain35, 100k
#   3. builder-side bench record on the idle chip
#
# Every step either runs under run_control_resilient.sh (chip lock +
# bench preemption built in) or inside hold_lock below, which honors the
# BENCH_WAITING flag between (non-resumable) commands so a driver bench
# can never be starved (BENCH_r04 rc=124).
set -ux
cd /root/repo
T=/tmp

wait_pid_gone() {
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
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
  # Do not start a new non-resumable chip step while a bench is waiting.
  local FLAG=.controls/BENCH_WAITING
  while [ -e "$FLAG" ]; do sleep 15; done
}

# 0. serialize behind the chain28 launcher (started separately; pid file).
# NOTE the pid must be the launcher's OWN pid ($$ from inside, or captured
# after setsid re-forks) — the first launch of this queue recorded setsid's
# transient pid, "waited" on a dead pid, and started the paper-scale
# launcher while chain28 was mid-train (two launchers then contend for the
# chip the moment a bench yield window opens, because run_control_resilient
# overwrites the advisory lock unconditionally at startup).
C28_PID=$(tr -dc 0-9 < $T/r5_c28.pid)
[ -n "$C28_PID" ] && wait_pid_gone "$C28_PID"
# Belt and braces: also wait until no chain28 launcher is listed (ps scan
# only — no pattern kills), so a wrong pid cannot repeat the overlap; the
# launcher process is continuous across attempt retries, unlike attempts.
while ps -eo cmd | grep -E "run_control_resilient.sh 28" \
      | grep -vq grep; do sleep 30; done

# 1. paper-scale production workload, deliberately killed every 1200 s.
wait_lock_free
CONTROL_CMD="/opt/venv/bin/python -u scripts/paper_scale_langevin.py" \
  bash scripts/run_control_resilient.sh 10 14 1200 > $T/r5_paper_scale.log 2>&1
echo "paper scale rc=$?"

# 2. bf16 iid quality vs f32 at 100k samples (non-resumable: run under a
# held lock, yielding between runs if a bench raises the flag).
wait_lock_free
mkdir -p .controls
echo $$ > .controls/CHIP_LOCK
trap 'rm -f .controls/CHIP_LOCK' EXIT
for N in 20 35; do
  for MODE in f32 bf16; do
    wait_bench_clear
    EXTRA=""; [ "$MODE" = bf16 ] && EXTRA="--bf16"
    timeout 5400 python -u scripts/ddim_quality.py --n_beads $N --ancestral \
      $EXTRA --steps 100 --num_samples 100000 \
      --out $T/r5_iid_${MODE}_c${N}.json >> $T/r5_bf16_quality.log 2>&1
    echo "$MODE c$N rc=$?" >> $T/r5_bf16_quality.log
  done
done
rm -f .controls/CHIP_LOCK

# 3. builder-side bench record.
wait_lock_free
wait_bench_clear
timeout 3600 python -u bench.py > $T/r5_bench.log 2>&1
echo "bench rc=$?"
echo QUEUE5R_DONE
