"""Checkpoint save/load: msgpack pytrees with best/last semantics.

Equivalent of reference Trainer.save/load (trainer.py:181-220): checkpoints
hold {step, params, ema_params, opt_state, best_val_loss}; ``model-last`` is
always written, ``model-best`` on a new best validation loss, per-milestone
checkpoints opt-in. The experiment config is written alongside as JSON
(instead of args.pickle).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(results_folder: str, name: str, state: dict) -> str:
    os.makedirs(results_folder, exist_ok=True)
    path = os.path.join(results_folder, f"model-{name}.msgpack")
    # to_state_dict first: msgpack cannot serialize tuples/NamedTuples
    # (optax opt states), state dicts are pure nested dicts.
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(state))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(results_folder: str, name: str = "last",
                    template: Optional[dict] = None) -> dict:
    path = os.path.join(results_folder, f"model-{name}.msgpack")
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if template is not None:
        state = serialization.from_state_dict(template, state)
    return state


def checkpoint_exists(results_folder: str, name: str = "last") -> bool:
    return os.path.exists(os.path.join(results_folder, f"model-{name}.msgpack"))
