"""Exponential moving average of parameters as pure pytree ops.

Matches ema-pytorch semantics as used by the reference trainer
(trainer.py:68: ``EMA(model, beta=ema_decay, update_every=10)``, defaults
``update_after_step=100, inv_gamma=1.0, power=2/3``):

- the EMA copies the online params for the first ``update_after_step``
  update calls,
- afterwards the decay ramps as ``1 - (1 + epoch/inv_gamma)^(-power)``
  clamped to ``beta``,
- updates apply every ``update_every`` calls.

All of it is branchless jnp (``where``-selected), so the EMA update fuses
into the jitted train step instead of being a separate host-driven pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.995
    update_after_step: int = 100
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def init_ema(params):
    return jax.tree_util.tree_map(jnp.array, params)


def current_decay(step, cfg: EMAConfig):
    """Decay used at EMA-update call ``step`` (0-indexed, counts .update() calls)."""
    epoch = jnp.clip(step - cfg.update_after_step - 1, 0, None).astype(jnp.float32)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    return jnp.where(epoch <= 0, 0.0, jnp.clip(value, 0.0, cfg.beta))


def ema_update(ema_params, params, step, cfg: EMAConfig):
    """One (possibly skipped) EMA update; ``step`` counts update calls so far."""
    do = (step % cfg.update_every) == 0
    decay = current_decay(step, cfg)

    def leaf(e, p):
        new = e * decay + p.astype(e.dtype) * (1.0 - decay)
        return jnp.where(do, new, e)

    return jax.tree_util.tree_map(leaf, ema_params, params)
