"""Strided-solver quality-vs-steps on a staged trained chain{N} artifact.

Scores strided DDIM / DPM-Solver++(2M) i.i.d. samples
(core/diffusion.py ddim_sample_loop / dpm_solver_pp_2m_loop) against the
same SyntheticTicScorer the production control uses, alongside the full
ancestral chain and the statistical floor — i.e. how much TIC-JS the
T/steps throughput multiplier costs. No reference equivalent (the
reference always runs all T=1000 steps, models/ddpm.py:234-254).

    python scripts/ddim_quality.py [--n_beads 10|20|28|35|56]
        [--steps 200 100 50 20] [--num_samples 100000]
        [--ancestral] [--device cpu|default]

Requires the staged chain{N} artifact (scripts/chain10_control.py
--n_beads N). Defaults follow VERDICT r3 #5: >=100k samples so the ladder
is resolved above the estimator's noise floor.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ASSETS_TRAINED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twoforone_tpu", "assets", "trained",
)


def rebuild_control(n_beads, artifact_dir=None):
    """Rebuild a staged control's exact configuration (positive_control.py
    run_chain_control defaults, seed=0): model shape from the preset,
    norm_factor = train-split std of the regenerated trajectory, trained
    EMA params from the staged checkpoint. Returns (gd, params, components).
    """
    import jax
    from flax import serialization

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.data.synthetic import (
        CHAIN10_TORSION_COMPONENTS,
        chain_trajectory,
        make_chain_components,
    )
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.train.positive_control import CHAIN_CONTROL_PRESETS
    from twoforone_tpu.utils.checkpoint import load_checkpoint

    preset = CHAIN_CONTROL_PRESETS[n_beads]
    if preset["components_seed"] is None:
        comp = CHAIN10_TORSION_COMPONENTS
    else:
        comp = make_chain_components(
            n_beads - 3, n_slow=preset["n_slow"], seed=preset["components_seed"]
        )
    traj = chain_trajectory(400000, comp, seed=0)
    norm_factor = float(traj[:280000].std())
    model = GraphTransformer(
        num_beads=n_beads, hidden_nf=preset["hidden_nf"],
        n_layers=preset["n_layers"], use_intrinsic_coords=True,
        use_abs_coords=False, use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(model=model, num_atoms=n_beads, timesteps=1000,
                           norm_factor=norm_factor, loss_weights="ones")
    template = {"ema_params": gd.init_params(jax.random.PRNGKey(0))}
    art = artifact_dir or os.path.join(ASSETS_TRAINED, f"chain{n_beads}")
    state = load_checkpoint(art, "best", None)
    params = serialization.from_state_dict(
        template["ema_params"], state["ema_params"]
    )
    return gd, params, comp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_beads", type=int, default=10)
    p.add_argument("--steps", type=int, nargs="+", default=[200, 100, 50, 20])
    p.add_argument("--solver", default="ddim", choices=["ddim", "dpm2m"])
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--num_samples", type=int, default=100000)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--ancestral", action="store_true",
                   help="also score the full T=1000 ancestral chain")
    p.add_argument("--device", default="default", choices=["cpu", "default"])
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 score-net compute in the reverse chain "
                        "(core/diffusion.py sample(bf16=True))")
    p.add_argument("--out", default=None, help="write results JSON here")
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from twoforone_tpu.data.synthetic import chain_dataset, chain_trajectory
    from twoforone_tpu.train.positive_control import SyntheticTicScorer
    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    gd, params, comp = rebuild_control(args.n_beads)

    scorer = SyntheticTicScorer(
        chain_trajectory(200000, comp, seed=10),
        chain_dataset(args.num_samples, comp, seed=11),
    )
    floor = scorer.tic_js(chain_dataset(args.num_samples, comp, seed=12))
    results = {"n_beads": args.n_beads, "tic_js_floor": floor,
               "eta": args.eta, "solver": args.solver, "bf16": args.bf16,
               "num_samples": args.num_samples}
    print(f"n_beads={args.n_beads} floor: {floor:.4f}  solver: {args.solver}"
          f"{'  bf16' if args.bf16 else ''}")

    def draw(sample_steps):
        fn = gd.make_sample_fn(args.batch, sample_steps=sample_steps,
                               eta=args.eta, solver=args.solver,
                               bf16=args.bf16)
        outs, key = [], jax.random.PRNGKey(100)
        t0 = time.perf_counter()
        n_batches = (args.num_samples + args.batch - 1) // args.batch
        for i in range(n_batches):
            key, sub = jax.random.split(key)
            outs.append(np.asarray(fn(params, sub)))
            # Heartbeat: a full-chain batch at N=35 runs ~3 min, so a long
            # draw is otherwise silent — the stall watchdog
            # (run_control_resilient.sh) needs output to distinguish a
            # wedged TPU RPC from a slow solver.
            print(f"  batch {i + 1}/{n_batches} ({time.strftime('%H:%M:%S')})",
                  flush=True)
        elapsed = time.perf_counter() - t0
        samples = np.concatenate(outs)[: args.num_samples]
        finite = np.isfinite(samples).all(axis=(1, 2))
        return samples[finite], elapsed, float(1 - finite.mean())

    ladders = list(args.steps) + ([1000] if args.ancestral else [])
    for k in ladders:
        samples, elapsed, nonfinite = draw(None if k == 1000 else k)
        js = scorer.tic_js(samples)
        results[f"tic_js_steps_{k}"] = js
        results[f"samples_per_sec_steps_{k}"] = round(len(samples) / elapsed, 2)
        print(f"steps={k}: TIC-JS {js:.4f}  "
              f"({len(samples) / elapsed:.1f} samples/s, "
              f"nonfinite {nonfinite:.4f})", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
