"""Alanine-dipeptide evaluation — script equivalent of the reference's
evaluate/evaluate_ala2.ipynb: score a sample file against the golden dihedral
references (Ramachandran free energy + dihedral JS/KL/MSE per fold).

Usage:
    python scripts/evaluate_ala2.py --samples path/to/sample-iid.npy \
        [--fold 1] [--evalset testset] [--out eval_out]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", required=True, help=".npy/.npz/.pt file of (B, 5, 3) Angstrom coords")
    p.add_argument("--fold", type=int, default=None, help="use fold-specific golden reference")
    p.add_argument("--evalset", default="testset", choices=["testset", "valset"])
    p.add_argument("--out", default="eval_ala2_out")
    p.add_argument("--device", default="cpu", choices=["cpu", "default"],
                   help="evaluation is host-side analysis; 'cpu' (default) "
                        "avoids claiming an accelerator for dihedral math")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from twoforone_tpu.data.molecules import SAVED_REFERENCES_DIR
    from twoforone_tpu.evaluate.evaluators import DihedralEnergiesEvaluator

    samples = _load(args.samples)
    assert samples.ndim == 3 and samples.shape[1:] == (5, 3), "expected (B, 5, 3)"

    if args.fold is not None:
        ref = os.path.join(
            SAVED_REFERENCES_DIR,
            f"saved_dih_probs_ala2_fold_{args.fold}_{args.evalset}.pickle",
        )
    else:
        ref = os.path.join(SAVED_REFERENCES_DIR, "saved_dih_probs_ala2_testset.pickle")

    os.makedirs(args.out, exist_ok=True)
    ev = DihedralEnergiesEvaluator(plots_folder=args.out, saved_ref=ref)
    mse, js, kl1, kl2 = ev.eval(samples, plot_freeE=True, milestone="script")
    results = {
        "Dihedral free-energy MSE (kcal/mol)^2": mse,
        "Dihedral JS": js,
        "KL(sample||ref)": kl1,
        "KL(ref||sample)": kl2,
    }
    with open(os.path.join(args.out, "results_ala2.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


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
