"""Export a twoforone-tpu checkpoint to the reference's torch format.

Writes a ``model-<name>.pt`` whose "ema" entry holds the graph-transformer
weights under the reference's state-dict key layout
(``ema_model.model.<...>``), so samples can be drawn with the upstream
``sample.py`` for cross-validation. Also writes an ``args.pickle``-style
namespace built from config.json.

Usage:
    python scripts/export_torch_checkpoint.py --model_path results/run \
        [--checkpoint best] [--out results/run/export]
"""

import argparse
import os
import pickle
import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import torch

    from twoforone_tpu.cli.sample import load_model
    from twoforone_tpu.utils.convert import build_ema_pytorch_state_dict

    gd, ema_params, trainset, cfg = load_model(args.model_path, args.checkpoint)
    # Full ema-pytorch 0.0.8 EMA(GaussianDiffusion) state dict: the upstream
    # sample.py:154-167 load is strict, so every key (online_model.*,
    # ema_model.*, DDPM buffers, initted, step) must be present.
    ema_state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in build_ema_pytorch_state_dict(gd, ema_params).items()
    }

    out = args.out or os.path.join(args.model_path, "export")
    os.makedirs(out, exist_ok=True)
    torch.save({"ema": ema_state}, os.path.join(out, f"model-{args.checkpoint}.pt"))

    ns = SimpleNamespace(**{k: v for k, v in cfg.__dict__.items() if k != "extra"})
    with open(os.path.join(out, "args.pickle"), "wb") as f:
        pickle.dump(ns, f)
    print(f"exported torch checkpoint + args.pickle to {out}")


if __name__ == "__main__":
    main()
