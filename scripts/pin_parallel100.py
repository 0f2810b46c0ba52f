"""Pin the BENCH_r02->r03 parallel_sim=100 discrepancy (VERDICT r3 weak #1).

BENCH_r02 measured 4035.5 steps/s at parallel_sim=100 (random weights);
BENCH_r03 measured 3220.0 (trained chain10 weights) with the formal
parallel_sim=1000 metric flat (504.6 vs 503.3). Candidate causes:
  (a) trained-vs-random weights  — should be cost-free (same FLOPs),
  (b) round-3 integrator chunking changes — same code path both rounds here,
  (c) TPU-pool contention during the r3 bench (chain35 control in flight).

This script measures the exact bench.py parallel_sim=100 configuration
(warmup 25k, timed 100k, steps_per_chunk=25k) A/B over weights, twice each,
on an otherwise idle chip, and prints one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _flagship

    from bench import _load_trained_params, bench_langevin

    model, gd = _flagship()
    trained = _load_trained_params(gd)
    random_p = gd.init_params(jax.random.PRNGKey(0))
    configs = [("random", random_p), ("trained", trained),
               ("random", random_p), ("trained", trained)]
    for name, params in configs:
        if params is None:
            print(json.dumps({"params": name, "skipped": "not staged"}))
            continue
        t0 = time.perf_counter()
        sps = bench_langevin(gd, params, parallel_sim=100,
                             warmup_steps=25_000, timed_steps=100_000)
        print(json.dumps({
            "params": name,
            "steps_per_sec_parallel100": round(sps, 1),
            "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
