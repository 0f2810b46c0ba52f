"""Production-scale chignolin-shaped control run (TPU).

Trains the shipped chignolin model shape at production scale on the
synthetic 10-bead 4-state system, scores TIC-JS / PWD-JS with the real
evaluator machinery, and stages the trained checkpoint as a repo artifact
(twoforone_tpu/assets/trained/chain10/) so bench.py can run its perf
measurements with physics-validated weights.

    python scripts/chain10_control.py                 # full budget (~20 min)
    python scripts/chain10_control.py --quick         # reduced budget
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twoforone_tpu", "assets", "trained", "chain10",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--train_iter", type=int, default=None)
    p.add_argument("--fused", type=str, default="auto")
    p.add_argument("--stage_artifact", type=lambda v: v != "false", default=True)
    args = p.parse_args()

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from twoforone_tpu.train.positive_control import run_chain10_control

    kwargs = dict(fused=args.fused)
    if args.quick:
        kwargs.update(
            train_iter=8000, n_data=120000, num_samples=20000,
            langevin_chains=256, langevin_steps=20000, eval_samples=20000,
        )
    if args.train_iter:
        kwargs["train_iter"] = args.train_iter

    t0 = time.time()
    results = run_chain10_control(**kwargs)
    results["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(results, indent=2))

    if args.stage_artifact:
        os.makedirs(ARTIFACT_DIR, exist_ok=True)
        src = os.path.join(results["results_folder"], "chain10_control_")
        for name in ("model-best.msgpack", "model-last.msgpack", "config.json"):
            path = os.path.join(src, name)
            if os.path.exists(path):
                shutil.copy(path, os.path.join(ARTIFACT_DIR, name))
        with open(os.path.join(ARTIFACT_DIR, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(f"artifact staged at {ARTIFACT_DIR}")


if __name__ == "__main__":
    main()
