"""Noise-level (t) sweep for the extracted force field of a trained control.

The score-to-force conversion quality depends on the fixed noise level t
(reference dynamics/langevin.py:46-92); the reference tuned t per protein
on real data (paper Table S4, evaluate/sampling_commands.md noise levels).
This script performs the analogous tuning for a chain{N} control artifact:
short Langevin runs at each candidate t, scored with the same
SyntheticTicScorer the control uses, chains initialized from the control's
own i.i.d. samples (the reference's --gen_mode langevin procedure,
/root/reference/sample.py:176-214).

    python scripts/langevin_t_sweep.py --n_beads 35 \
        --artifact_dir .controls/chain35_staged_pending \
        --init .controls/chain35_run/post_iid.npy \
        --t 3 5 8 10 15 20 30
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from ddim_quality import rebuild_control  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_beads", type=int, default=35)
    p.add_argument("--artifact_dir", default=None)
    p.add_argument("--init", required=True,
                   help=".npy of iid samples to draw initial chains from")
    p.add_argument("--t", type=int, nargs="+",
                   default=[3, 5, 8, 10, 15, 20, 30])
    p.add_argument("--chains", type=int, default=500)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--save_interval", type=int, default=250)
    p.add_argument("--eval_samples", type=int, default=50000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dt_scale", type=float, default=1.0)
    p.add_argument("--save_traj", default=None,
                   help="save the raw trajectory of the LAST t here (.npy); "
                   "with control-matching chains/steps/seed it is reusable "
                   "as the control's cached post_langevin.npy stage")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from twoforone_tpu.data.synthetic import chain_dataset, chain_trajectory
    from twoforone_tpu.dynamics.langevin import LangevinDiffusion
    from twoforone_tpu.train.positive_control import (
        CHAIN_CONTROL_PRESETS,
        SyntheticTicScorer,
    )
    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("rebuilding control...", flush=True)
    gd, params, comp = rebuild_control(args.n_beads, args.artifact_dir)
    preset = CHAIN_CONTROL_PRESETS[args.n_beads]

    iid = np.load(args.init)
    iid = iid[np.isfinite(iid).all(axis=(1, 2))]
    rng = np.random.default_rng(args.seed + 3)
    init = iid[rng.integers(0, len(iid), args.chains)]

    # All sims first (TPU-bound), scoring after (CPU-bound scorer fit) —
    # so the device is released as early as possible for whatever is
    # queued behind this sweep.
    trajs = {}
    for t in args.t:
        t0 = time.time()
        sim = LangevinDiffusion(
            gd, params, init,
            n_timesteps=args.steps, save_interval=args.save_interval,
            t=t, temp_data=preset["temp"], temp_sim=preset["temp"],
            dt=None, masses=[12.0] * args.n_beads, friction=1.0,
            kb="consistent", random_seed=args.seed, log=False, fused="auto",
            dt_scale=args.dt_scale,
        )
        trajs[t] = np.asarray(sim.sample())
        if args.save_traj:
            tmp = args.save_traj + ".tmp.npy"
            np.save(tmp, trajs[t])
            os.replace(tmp, args.save_traj)
        print(f"t={t:3d}  simulated  ({time.time() - t0:.0f}s)", flush=True)
    print("sims done", flush=True)

    print("fitting scorer...", flush=True)
    scorer = SyntheticTicScorer(
        chain_trajectory(200000, comp, seed=args.seed + 10),
        chain_dataset(args.eval_samples, comp, seed=args.seed + 11),
    )
    floor = scorer.tic_js(
        chain_dataset(args.eval_samples, comp, seed=args.seed + 12)
    )

    results = {"n_beads": args.n_beads, "tic_js_floor": floor,
               "chains": args.chains, "steps": args.steps,
               "dt_scale": args.dt_scale, "t": {}}
    print(f"floor={floor:.4f}  iid_js={scorer.tic_js(iid):.4f}", flush=True)
    for t, traj in trajs.items():
        finite = np.isfinite(traj).all(axis=(1, 2))
        js = scorer.tic_js(traj[finite]) if finite.any() else float("nan")
        results["t"][t] = {
            "tic_js": js,
            "nonfinite_frac": float(1.0 - finite.mean()),
        }
        print(f"t={t:3d}  tic_js={js:.4f}  "
              f"nonfinite={1.0 - finite.mean():.4f}", flush=True)

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
