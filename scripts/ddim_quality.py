"""DDIM quality-vs-steps on the trained chain10 control artifact.

Scores strided-DDIM i.i.d. samples (core/diffusion.py ddim_sample_loop)
against the same SyntheticTicScorer the production control uses, alongside
the full ancestral chain and the statistical floor — i.e. how much TIC-JS
the T/steps throughput multiplier costs. No reference equivalent (the
reference always runs all T=1000 steps, models/ddpm.py:234-254).

    python scripts/ddim_quality.py [--steps 200 100 50 20] [--num_samples 20000]
        [--ancestral] [--device cpu|default]

Requires the staged chain10 artifact (scripts/chain10_control.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twoforone_tpu", "assets", "trained", "chain10",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, nargs="+", default=[200, 100, 50, 20])
    p.add_argument("--solver", default="ddim", choices=["ddim", "dpm2m"])
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--num_samples", type=int, default=20000)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--ancestral", action="store_true",
                   help="also score the full T=1000 ancestral chain")
    p.add_argument("--device", default="default", choices=["cpu", "default"])
    p.add_argument("--out", default=None, help="write results JSON here")
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from flax import serialization

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.data.synthetic import (
        CHAIN10_TORSION_COMPONENTS,
        chain_dataset,
        chain_trajectory,
    )
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.train.positive_control import SyntheticTicScorer
    from twoforone_tpu.utils.checkpoint import load_checkpoint

    # Rebuild the control's exact configuration (positive_control.py
    # run_chain_control, n_beads=10, seed=0): norm_factor is the train-split
    # std of the regenerated trajectory.
    comp = CHAIN10_TORSION_COMPONENTS
    traj = chain_trajectory(400000, comp, seed=0)
    # exactly the control's norm_factor: trainset.data.std() on the raw
    # 70% train split (CGDataset stores the array as passed)
    norm_factor = float(traj[:280000].std())
    model = GraphTransformer(
        num_beads=10, hidden_nf=64, n_layers=3, use_intrinsic_coords=True,
        use_abs_coords=False, use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(model=model, num_atoms=10, timesteps=1000,
                           norm_factor=norm_factor, loss_weights="ones")
    template = {"ema_params": gd.init_params(jax.random.PRNGKey(0))}
    state = load_checkpoint(ART, "best", None)
    params = serialization.from_state_dict(
        template["ema_params"], state["ema_params"]
    )

    scorer = SyntheticTicScorer(
        chain_trajectory(200000, comp, seed=10),
        chain_dataset(args.num_samples, comp, seed=11),
    )
    floor = scorer.tic_js(chain_dataset(args.num_samples, comp, seed=12))
    results = {"tic_js_floor": floor, "eta": args.eta,
               "solver": args.solver, "num_samples": args.num_samples}
    print(f"floor: {floor:.4f}  solver: {args.solver}")

    def draw(sample_steps):
        fn = gd.make_sample_fn(args.batch, sample_steps=sample_steps,
                               eta=args.eta, solver=args.solver)
        outs, key = [], jax.random.PRNGKey(100)
        t0 = time.perf_counter()
        for i in range((args.num_samples + args.batch - 1) // args.batch):
            key, sub = jax.random.split(key)
            outs.append(np.asarray(fn(params, sub)))
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
              f"nonfinite {nonfinite:.4f})")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
