"""Pin the round-5 protein_g Langevin discrepancy (PERF_NOTES "Round 5").

The round-5 preempting bench measured 24.16 steps/s at parallel_sim=1000 on
the protein_g leg vs 34.19 in the round-3 driver bench — while every other
leg was flat to <1%. Cost is weight-independent (round-4 A/B, <=2%), so the
candidates are (a) a cold-compile tail inside the 1000-step timed window
(warmup is only 500 steps at N=56 and that bench ran on a cold XLA cache)
or (b) machine variance. This measures the exact bench.py protein_g leg on
an otherwise idle chip, twice back-to-back, plus a long-warmup variant
(warmup 2000) that cannot have a compile tail; one JSON line each.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import bench_langevin_protein

    configs = [
        ("bench_leg", 500, 1000),
        ("bench_leg_repeat", 500, 1000),
        ("long_warmup", 2000, 1000),
    ]
    for label, warmup, timed in configs:
        t0 = time.time()
        sps, kind = bench_langevin_protein(
            "protein_g", parallel_sim=1000, warmup_steps=warmup,
            timed_steps=timed,
        )
        print(json.dumps({
            "label": label, "warmup_steps": warmup, "timed_steps": timed,
            "steps_per_sec": round(float(sps), 2), "params": kind,
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
