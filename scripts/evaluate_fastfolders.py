"""Fast-folder evaluation — script equivalent of the reference's
evaluate/evaluate_fastfolders.ipynb: score sampled conformations (i.i.d. or
Langevin trajectories) with PWD JS, TICA JS (+ map plot), RMSD free energy,
contact maps/BCE, and — for trajectories — TIC-space cluster transition
matrices.

Usage:
    python scripts/evaluate_fastfolders.py --mol chignolin \
        --samples path/to/sample.npy [--trajectory --n-sims 100] [--out eval_out]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mol", required=True,
                   help="chignolin | trp_cage | bba | villin | protein_g")
    p.add_argument("--samples", required=True)
    p.add_argument("--evalset", default="testset", choices=["testset", "valset"])
    p.add_argument("--out", default="eval_fastfolders_out")
    p.add_argument("--trajectory", action="store_true",
                   help="treat samples as Langevin output for kinetic analysis")
    p.add_argument("--n-sims", type=int, default=100,
                   help="number of parallel chains in the trajectory file")
    p.add_argument("--lagtime", type=int, default=1,
                   help="transition-count lagtime in saved frames")
    p.add_argument("--n-clusters", type=int, default=4)
    p.add_argument("--device", default="cpu", choices=["cpu", "default"],
                   help="evaluation is host-side analysis; 'cpu' (default) "
                        "avoids claiming an accelerator for feature math")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from twoforone_tpu.evaluate.evaluators import (
        ContactEvaluator,
        PwdEvaluator,
        RmsdEvaluator,
        TicEvaluator,
    )
    from twoforone_tpu.evaluate.kinetics import tic_state_analysis

    samples = _load(args.samples)
    os.makedirs(args.out, exist_ok=True)
    results = {}

    mol = args.mol.lower()
    has_tic_golden = mol in ("chignolin", "trp_cage")

    # PWD JS vs golden (offset 3, like the notebook)
    pwd = PwdEvaluator(mol_name=mol, offset=3, evalset=args.evalset)
    results["PWD JS (offset 3)"] = pwd.eval(samples)

    # TICA JS + map (golden models shipped for chignolin/trp_cage)
    tic = None
    if has_tic_golden:
        tic = TicEvaluator(mol_name=mol, eval_folder=args.out, evalset=args.evalset)
        js, _ = tic.eval(samples, title="script", plot_tic=True)
        results["TIC JS"] = js

    # RMSD free energy vs golden reference curve
    rmsd = RmsdEvaluator(mol, eval_folder=args.out)
    if os.path.exists(rmsd.saved_ref):
        rmsd.eval("Reference", cutoff=rmsd.cutoff_ref, nbins=100)
    rmsd.eval("Sampled", samples, nbins=100, cutoff=rmsd.cutoff_ref)
    rmsd.plot(save=True)
    results["RMSD mean (A)"] = float(
        np.nanmean(
            np.asarray(
                rmsd.eval("SampledDyn", samples[:10000], nbins=100,
                          cutoff=rmsd.cutoff_ref, save_dynamics=True)["rmsd"]
            )
        )
    )

    # Contacts
    contact = ContactEvaluator(mol, eval_folder=args.out)
    results["Contact BCE to folded"] = contact.eval_bce(samples[:10000])
    contact.plot_contact_normcount(samples[:10000], "Sampled", save=True)

    # Kinetics (trajectories only): TIC clustering + transition matrices
    if args.trajectory and tic is not None:
        n_frames = len(samples) // args.n_sims
        traj = samples[: n_frames * args.n_sims].reshape(
            args.n_sims, n_frames, *samples.shape[1:]
        )
        analysis = tic_state_analysis(
            tic.tica, tic.get_tic_features, traj,
            n_clusters=args.n_clusters, lagtime=args.lagtime,
        )
        results["transition_matrix"] = analysis["transition_matrix"].tolist()
        results["state_counts"] = np.bincount(
            analysis["labels"].ravel(), minlength=args.n_clusters
        ).tolist()

    with open(os.path.join(args.out, f"results_{mol}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if not isinstance(v, list)},
                     indent=2))


def _load(path):
    if path.endswith(".pt"):
        import torch

        return np.asarray(torch.load(path, map_location="cpu").numpy())
    arr = np.load(path)
    if isinstance(arr, np.lib.npyio.NpzFile):
        arr = arr[list(arr.keys())[0]]
    return np.asarray(arr)


if __name__ == "__main__":
    main()
