#!/bin/bash
# Round-4 TPU queue v3: finish protein_g bench -> bf16-activation A/B ->
# 100k solver ladder -> chain56 warm-restart retrain.
set -ux
cd /root/repo
T=/tmp

# 0. wait for the in-flight (old-script) protein_g bench to release the chip
for i in $(seq 1 120); do
  grep -q "bench protein_g rc=" $T/r4_packed_bench.log 2>/dev/null && break
  sleep 30
done
sleep 5

# 1. re-measure villin + protein_g with the bf16-activation timing added
for MOL in villin protein_g; do
  timeout 3600 python -u scripts/bench_cl_proteins.py $MOL 1024 \
    >> $T/r4_bf16_bench.log 2>&1
  echo "bf16 bench $MOL rc=$?" >> $T/r4_bf16_bench.log
done

# 2. strided-solver quality ladder at 100k samples (VERDICT #5)
for N in 20 35; do
  for S in ddim dpm2m; do
    timeout 7200 python -u scripts/ddim_quality.py --n_beads $N --solver $S \
      --steps 200 100 50 20 10 --num_samples 100000 \
      --out $T/r4_ladder_c${N}_${S}.json >> $T/r4_ladder.log 2>&1
    echo "ladder N=$N $S rc=$?" >> $T/r4_ladder.log
  done
done

# 3. chain56: warm-restart training 50k->150k, fresh stages, tuned knobs
rm -f .controls/chain56_run/post_iid.npy .controls/chain56_run/post_langevin.npy
CONTROL_EXTRA="--train_iter 150000 --t_noise 5 --langevin_dt_scale 0.35" \
  bash scripts/run_control_resilient.sh 56 8 9000 > $T/r4_c56_retrain.log 2>&1
echo "c56 retrain rc=$?"
echo QUEUE3_DONE
