#!/bin/bash
# Round-4 TPU queue v2: packed-attention bench -> 100k solver ladder ->
# chain56 continue-train (150k steps, tuned Langevin knobs).
set -ux
cd /root/repo
T=/tmp

# 0. wait for the chain35 restage orphan to release the chip (max 90 min)
for i in $(seq 1 180); do
  grep -q "artifact staged\|not staging\|Traceback" $T/r4_c35_restage.log && break
  sleep 30
done
sleep 10

# 1. packed-attention measurement at the r3 table's 1024 chains (VERDICT #3)
for MOL in villin protein_g; do
  timeout 3600 python -u scripts/bench_cl_proteins.py $MOL 1024 \
    >> $T/r4_packed_bench.log 2>&1
  echo "bench $MOL rc=$?" >> $T/r4_packed_bench.log
done

# 2. strided-solver quality ladder at 100k samples (VERDICT #5); the
# full-chain reference numbers already live in the controls' results.json
for N in 20 35; do
  for S in ddim dpm2m; do
    timeout 7200 python -u scripts/ddim_quality.py --n_beads $N --solver $S \
      --steps 200 100 50 20 10 --num_samples 100000 \
      --out $T/r4_ladder_c${N}_${S}.json >> $T/r4_ladder.log 2>&1
    echo "ladder N=$N $S rc=$?" >> $T/r4_ladder.log
  done
done

# 3. chain56: warm-restart training 50k->150k (cosine re-stretched), fresh
# iid + Langevin stages at the tuned knobs; staging is bar-gated now.
rm -f .controls/chain56_run/post_iid.npy .controls/chain56_run/post_langevin.npy
CONTROL_EXTRA="--train_iter 150000 --t_noise 5 --langevin_dt_scale 0.35" \
  bash scripts/run_control_resilient.sh 56 8 9000 > $T/r4_c56_retrain.log 2>&1
echo "c56 retrain rc=$?"
echo QUEUE2_DONE
