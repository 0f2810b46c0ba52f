"""Symmetry checkers for score networks.

Functional port of the reference's manual reflection checker
(utils.py:183-198), extended to rotations and translations, returning the L1
gaps instead of printing so they can be asserted in tests/CI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def check_reflection_equivariance(score_fn, num_beads: int, key=None,
                                  batch: int = 256):
    """Returns (invariance_gap, equivariance_gap) under x-axis reflection."""
    if key is None:
        key = jax.random.PRNGKey(0)
    x_a = jax.random.normal(key, (batch, num_beads, 3))
    x_b = x_a.at[:, :, 0].multiply(-1.0)
    t = jnp.full((batch,), 0.5)
    out_a = score_fn(x_a, t)
    out_b = score_fn(x_b, t)
    invariance_gap = jnp.abs(out_a - out_b).mean()
    out_b_reflected = out_b.at[:, :, 0].multiply(-1.0)
    equivariance_gap = jnp.abs(out_a - out_b_reflected).mean()
    return float(invariance_gap), float(equivariance_gap)


def check_rotation_equivariance(score_fn, num_beads: int, key=None,
                                batch: int = 256):
    """L1 gap between rotate(f(x)) and f(rotate(x))."""
    from twoforone_tpu.ops.geometry import random_rotation

    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (batch, num_beads, 3))
    t = jnp.full((batch,), 0.5)
    x_rot, rots = random_rotation(x, k2, return_matrices=True)
    out = score_fn(x, t)
    out_rot_expected = jnp.einsum("bij,bnj->bni", rots, out)
    out_rot = score_fn(x_rot, t)
    return float(jnp.abs(out_rot - out_rot_expected).mean())


def check_translation_invariance(score_fn, num_beads: int, key=None,
                                 batch: int = 256, shift: float = 5.0):
    if key is None:
        key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, num_beads, 3))
    t = jnp.full((batch,), 0.5)
    return float(jnp.abs(score_fn(x, t) - score_fn(x + shift, t)).mean())
