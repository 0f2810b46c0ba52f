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

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host entry point: wire this process into a JAX distributed job.

    The TPU-native replacement for scaling beyond one host (the reference
    tops out at single-process DataParallel, trainer.py:73-86). On a TPU pod
    slice (e.g. v5e-16 = 4 hosts) every host runs the same program;
    ``jax.distributed.initialize()`` discovers the job through the TPU
    metadata service, after which ``jax.devices()`` is the GLOBAL device
    list and ``get_mesh()`` spans the slice — batch/chain sharding then
    rides ICI with no further code changes (see docs/MULTIHOST.md).

    Explicit ``coordinator_address``/``num_processes``/``process_id`` serve
    non-TPU fleets (CPU/GPU) or tests. Returns True if distributed mode was
    initialized, False if this is a plain single-process run (no coordinator
    configured anywhere) — in which case this is a no-op, so the flag is
    always safe to pass.
    """
    configured = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        # TPU pod runtime: the metadata service provides discovery; the
        # env var below is set on multi-host TPU VMs.
        or os.environ.get("TPU_WORKER_HOSTNAMES")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not configured and (num_processes is None or num_processes <= 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def get_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1D mesh over all (or the given) devices — global across processes in
    a multi-host job (call :func:`initialize_distributed` first)."""
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

    Multi-host: each process passes its LOCAL portion of the global batch
    (global batch axis = local axis x process_count); the pieces are stitched
    into one global array without cross-host transfers.
    """
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(batch)
    spec_axes = [None] * batch.ndim
    spec_axes[batch_axis] = axis_name
    sharding = NamedSharding(mesh, P(*spec_axes))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(batch))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Optional[Mesh] = None):
    """Replicate a pytree (parameters, opt state) across the mesh."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(tree)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def mesh_size(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else int(np.prod(mesh.devices.shape))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """NamedSharding placing the leading chain/batch axis of a
    (chains, beads, 3) array over the mesh's first axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def round_to_mesh(n: int, mesh: Optional[Mesh]) -> int:
    """Smallest multiple of the mesh size >= n (chain/batch-axis padding)."""
    d = mesh_size(mesh)
    return ((n + d - 1) // d) * d
