#!/bin/bash
# Round-5 follower queue: after the main queue drains, retry chain28's
# Langevin leg at dt_scale=0.35 (BAOAB stationary bias ~ dt^2: the 150k
# window at 0.5 measured occupancy error 0.1031, 3% over the 0.10 bar,
# GROWING from 0.039 at 50k — relaxation toward a biased stationary
# distribution, so the fix is a smaller step, and 250k steps keep the
# hop fraction above bar at the slower per-step diffusion).
set -ux
cd /root/repo
T=/tmp

for i in $(seq 1 480); do
  grep -q QUEUE5_DONE $T/r5_queue.log 2>/dev/null && break
  sleep 60
done

CONTROL_EXTRA="--langevin_dt_scale 0.35 --langevin_steps 250000" \
  bash scripts/run_control_resilient.sh 28 4 9000 > $T/r5_c28_dt035.log 2>&1
echo "c28 dt035 rc=$?"
echo QUEUE5B_DONE
