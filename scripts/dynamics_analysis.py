"""Offline dynamics analysis of a control run's saved Langevin trajectory.

Two analyses on `.controls/chain{N}_run/post_langevin.npy` (the raw
chain-major product of the production control's Langevin stage):

1. **Slow-torsion ergodicity** (evaluate/ergodicity.py): per bimodal
   torsion, the fraction of chains that crossed basins, pooled hop rate,
   and basin-occupancy error vs the generator weights. The necessary
   condition the stationary TIC-JS bar cannot test (chains are
   iid-initialized, so a frozen force field still scores a perfect
   histogram).
2. **TIC-space transition-count matrices** (evaluate/kinetics.py): the
   reference fast-folder notebook's dynamics-only analysis
   (evaluate/evaluate_fastfolders.ipynb cells 21-24) run on trained-model
   output — MiniBatchKMeans states in the 2D TIC plane, sliding
   transition counts per chain, row-normalized transition matrix.

Writes docs/dynamics_chain{N}.json. CPU-only (numpy + the CPU TICA fit);
safe to run while the TPU is busy.

    python scripts/dynamics_analysis.py --n_beads 35 [--chains 1000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_beads", type=int, default=35)
    p.add_argument("--chains", type=int, default=1000,
                   help="langevin_chains of the control run (layout recovery)")
    p.add_argument("--traj", type=str, default=None,
                   help="override trajectory path (default: .controls/chain{N}_run/post_langevin.npy)")
    p.add_argument("--n_clusters", type=int, default=4)
    p.add_argument("--lagtime", type=int, default=1,
                   help="transition-count lag in SAVED frames")
    p.add_argument("--ref_frames", type=int, default=200000)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from twoforone_tpu.data.synthetic import (
        CHAIN10_TORSION_COMPONENTS,
        chain_dataset,
        chain_trajectory,
        make_chain_components,
    )
    from twoforone_tpu.evaluate.ergodicity import slow_torsion_ergodicity
    from twoforone_tpu.evaluate.kinetics import tic_state_analysis
    from twoforone_tpu.train.positive_control import (
        CHAIN_CONTROL_PRESETS,
        SyntheticTicScorer,
    )

    n = args.n_beads
    preset = CHAIN_CONTROL_PRESETS[n]
    if preset["components_seed"] is None:
        components = CHAIN10_TORSION_COMPONENTS
    else:
        components = make_chain_components(
            n - 3, n_slow=preset["n_slow"], seed=preset["components_seed"]
        )

    traj_path = args.traj
    if traj_path is None:
        # Newest Langevin stage product: stage caches are keyed by the
        # knobs that define them (post_langevin_t{t}_dt{scale}_s{steps}.npy
        # since round 5; plain post_langevin.npy before that).
        import glob

        candidates = sorted(
            glob.glob(os.path.join(REPO, ".controls", f"chain{n}_run",
                                   "post_langevin*.npy")),
            key=os.path.getmtime,
        )
        if not candidates:
            raise SystemExit(f"no post_langevin*.npy under "
                             f".controls/chain{n}_run — pass --traj")
        traj_path = candidates[-1]
    traj = np.load(traj_path)
    traj = traj.reshape(args.chains, -1, n, 3)
    print(f"trajectory {traj_path}: {traj.shape} (chains, frames, beads, 3)")

    erg = slow_torsion_ergodicity(traj, components)
    print(json.dumps({k: v for k, v in erg.items() if k != "per_torsion"}))

    # Notebook-parity transition analysis: TICA fit on an independent
    # Metropolis reference trajectory (the control's own scorer recipe),
    # k-means states over the pooled Langevin TIC projections.
    scorer = SyntheticTicScorer(
        chain_trajectory(args.ref_frames, components, seed=10),
        chain_dataset(50000, components, seed=11),
    )
    analysis = tic_state_analysis(
        scorer.tica, scorer._feats, traj,
        n_clusters=args.n_clusters, lagtime=args.lagtime,
    )
    counts = analysis["counts"]
    off_diag = float(counts.sum() - np.trace(counts)) / max(counts.sum(), 1)

    out = {
        "n_beads": n,
        "trajectory": os.path.relpath(traj_path, REPO),
        "shape": list(traj.shape),
        "ergodicity": {
            **{k: v for k, v in erg.items() if k != "per_torsion"},
            "per_torsion": {
                str(k): v for k, v in erg["per_torsion"].items()
            },
        },
        "tic_transitions": {
            "n_clusters": args.n_clusters,
            "lagtime_saved_frames": args.lagtime,
            "counts": counts.tolist(),
            "transition_matrix": np.round(
                analysis["transition_matrix"], 5
            ).tolist(),
            "off_diagonal_fraction": off_diag,
            "states_visited": int((counts.sum(axis=1) > 0).sum()),
        },
    }
    out_path = os.path.join(REPO, "docs", f"dynamics_chain{n}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {out_path}")
    print(f"TIC off-diagonal transition fraction: {off_diag:.4f}; "
          f"states visited: {out['tic_transitions']['states_visited']}/{args.n_clusters}")


if __name__ == "__main__":
    main()
