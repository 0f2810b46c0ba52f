"""Staged trained-control artifact access (``assets/trained/<name>/``).

A staged artifact is the output of a bar-gated control run
(scripts/chain10_control.py): EMA weights (``model-best.msgpack``), the
training config (``config.json``), and the physics scores that gated the
staging (``results.json``). The reference ships the analogous artifacts as
``saved_models/<protein>/`` checkpoints + ``args.pickle``
(/root/reference/saved_models/); here every consumer — the round bench,
the paper-scale production workload, the quality scripts — loads them
through this one helper so "the weights the bench measures" and "the
weights the physics bars validated" cannot drift apart.
"""

from __future__ import annotations

import json
import os
from typing import Optional

_TRAINED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "trained",
)


def trained_dir(name: str) -> str:
    """Directory of the staged artifact ``name`` (e.g. ``chain10``)."""
    return os.path.join(_TRAINED, name)


def is_staged(name: str) -> bool:
    return os.path.exists(os.path.join(trained_dir(name), "model-best.msgpack"))


def load_results(name: str) -> Optional[dict]:
    """The physics scores that gated the staging, or None when unstaged."""
    path = os.path.join(trained_dir(name), "results.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_ema_params(gd, name: str):
    """EMA weights of a staged artifact, as the pytree of ``gd``.

    ``gd`` (a GaussianDiffusion) supplies the parameter template — the
    checkpoint stores a state dict, and restoring against a template is
    what makes a shape/architecture mismatch a loud error instead of a
    silently reinterpreted buffer. Returns None when unstaged.
    """
    if not is_staged(name):
        return None
    import jax
    from flax import serialization

    from twoforone_tpu.utils.checkpoint import load_checkpoint

    template = gd.init_params(jax.random.PRNGKey(0))
    state = load_checkpoint(trained_dir(name), "best", None)
    return serialization.from_state_dict(template, state["ema_params"])
