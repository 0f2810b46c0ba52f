"""Benchmark: Langevin steps/sec/chip on the chignolin workload.

The driver-defined north-star metric (BASELINE.json): BAOA(F)B Langevin
dynamics driven by the chignolin-config diffusion force field (nf=64,
3 layers, conservative forces via jax.grad, noise_level t=20) with
parallel_sim=100 chains — the configuration of the paper's production runs
(reference evaluate/sampling_commands.md:8-20).

``vs_baseline`` is measured against the torch-CPU reference-equivalent
implementation (scripts/bench_baseline_torch.py -> BASELINE_MEASURED.json);
the reference repo itself publishes no numbers.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from twoforone_tpu.dynamics.langevin import LangevinDiffusion
    from __graft_entry__ import _flagship

    model, gd = _flagship()  # chignolin shipped config
    params = gd.init_params(jax.random.PRNGKey(0))

    parallel_sim = 100
    rng = np.random.default_rng(0)
    init = rng.normal(size=(parallel_sim, 10, 3)).astype(np.float32)
    init = (init - init.mean(axis=1, keepdims=True)) * gd.norm_factor

    sim = LangevinDiffusion(
        gd, params, init,
        n_timesteps=10_000_000,
        save_interval=500,
        t=20,
        temp_data=340, temp_sim=340,
        dt=2e-3,
        masses=[12.0] * 10,
        friction=1.0,
        kb="consistent",
        random_seed=0,
        steps_per_chunk=25_000,
        log=False,
        # bfloat16 score-net compute: the TPU-idiomatic analogue of the
        # reference's AMP; validated to leave the Langevin equilibrium
        # distribution unchanged (docs/PERF_NOTES.md).
        bf16=True,
        # The benchmark model is untrained, so its energy landscape is
        # unbounded below; a harmonic tether + force clipping keep the
        # trajectories finite (two fused elementwise ops, no measurable cost).
        restraint_k=50.0,
        max_force=1e3,
    )

    # Warmup: compile + one chunk.
    sim.sim.simulate(sub_interval=25_000)

    timed_steps = 100_000
    t0 = time.perf_counter()
    sim.sim.simulate(sub_interval=timed_steps)
    elapsed = time.perf_counter() - t0
    steps_per_sec = timed_steps / elapsed

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("langevin_steps_per_sec_cpu_torch")
        if ref:
            vs_baseline = steps_per_sec / ref

    print(json.dumps({
        "metric": "langevin_steps_per_sec_chip_chignolin_parallel100",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": None if vs_baseline is None else round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
