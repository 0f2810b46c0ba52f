"""Device mesh + sharding utilities.

The reference's only parallelism is single-process torch DataParallel
(trainer.py:73-86, sample.py:180-186): replicate the model, scatter the batch,
gather the outputs. The TPU-native equivalent is a 1D ``jax.sharding.Mesh``
over the data/chain axis:

- training: batch sharded over ``data``; parameters replicated; XLA inserts
  the gradient all-reduce over ICI automatically from the shardings,
- i.i.d. sampling and Langevin chains: the batch/chain axis shards over
  ``data`` with NO collectives in the hot loop (chains are independent), so
  scaling is linear across chips and multi-slice (DCN) deployments can shard
  the same axis across slices.

Everything degrades gracefully to a 1-device mesh on a single chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh: Optional[Mesh] = None, axis_name: str = "data",
                batch_axis: int = 0):
    """Place a batch with its ``batch_axis`` sharded over the mesh (other
    axes replicated — e.g. the leading micro-batch axis under gradient
    accumulation stays whole on every device).

    Pads nothing: the caller must make the batch axis divisible by the mesh
    size (the trainer rounds batch sizes accordingly).
    """
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(batch)
    spec_axes = [None] * batch.ndim
    spec_axes[batch_axis] = axis_name
    return jax.device_put(batch, NamedSharding(mesh, P(*spec_axes)))


def replicate(tree, mesh: Optional[Mesh] = None):
    """Replicate a pytree (parameters, opt state) across the mesh."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(tree)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
