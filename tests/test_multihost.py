"""True multi-process distributed-training test (VERDICT r2 #7 follow-up).

Launches TWO OS processes that wire themselves into one JAX distributed job
via ``initialize_distributed`` (explicit coordinator, gloo CPU collectives),
each owning 4 virtual CPU devices of an 8-device global mesh. Each process
feeds its process-LOCAL half of a global batch through ``shard_batch``
(``make_array_from_process_local_data``) and computes the data-parallel loss
and gradient of the real ``GaussianDiffusion.loss``. The result must equal a
single-process oracle on the full global batch — i.e. the multi-host path
computes exactly what single-host does, with the cross-process all-reduce
inserted by XLA/gloo instead of torch DataParallel's scatter/gather
(reference capability: trainer.py:73-86).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
pid, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, %(repo)r)
import jax.numpy as jnp
import numpy as np
from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.models.graph_transformer import GraphTransformer
from twoforone_tpu.parallel.mesh import (
    get_mesh, initialize_distributed, replicate, shard_batch,
)

assert initialize_distributed(
    "localhost:" + port, num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
assert len(jax.devices()) == 8  # global
assert len(jax.local_devices()) == 4

model = GraphTransformer(
    num_beads=10, hidden_nf=16, n_layers=1, use_intrinsic_coords=True,
    use_abs_coords=False, use_distances=False, conservative=True,
)
gd = GaussianDiffusion(
    model=model, num_atoms=10, timesteps=1000,
    norm_factor=3.11, loss_weights="ones",
)
params = gd.init_params(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)

# Global batch 16: process 0 owns rows [0:8), process 1 rows [8:16).
full = np.random.default_rng(0).normal(size=(16, 10, 3)).astype(np.float32) * 3.11
local = full[pid * 8:(pid + 1) * 8]

mesh = get_mesh()
batch = shard_batch(local, mesh)
params_r = replicate(params, mesh)

loss, grads = jax.jit(
    lambda p, b, k: jax.value_and_grad(lambda q: gd.loss(q, b, k)[0])(p)
)(params_r, batch, key)
leaves = jax.tree_util.tree_leaves(grads)
gnorm = float(jnp.sqrt(sum(jnp.sum(l.astype(jnp.float64) ** 2) for l in leaves)))
json.dump({"loss": float(loss), "gnorm": gnorm},
          open(out_path, "w"))
"""


def test_two_process_distributed_loss_matches_single_process(tmp_path):
    import jax
    import jax.numpy as jnp

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.models.graph_transformer import GraphTransformer

    # Single-process oracle on the full global batch (this interpreter).
    model = GraphTransformer(
        num_beads=10, hidden_nf=16, n_layers=1, use_intrinsic_coords=True,
        use_abs_coords=False, use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(
        model=model, num_atoms=10, timesteps=1000,
        norm_factor=3.11, loss_weights="ones",
    )
    params = gd.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    full = np.random.default_rng(0).normal(size=(16, 10, 3)).astype(np.float32) * 3.11
    loss_ref, grads_ref = jax.jit(
        lambda p, b, k: jax.value_and_grad(lambda q: gd.loss(q, b, k)[0])(p)
    )(params, jnp.asarray(full), key)
    leaves = jax.tree_util.tree_leaves(grads_ref)
    gnorm_ref = float(
        jnp.sqrt(sum(jnp.sum(l.astype(jnp.float64) ** 2) for l in leaves))
    )

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": REPO})
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port,
             str(tmp_path / f"out{pid}.json")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    for pid in range(2):
        rec = json.loads((tmp_path / f"out{pid}.json").read_text())
        assert rec["loss"] == __import__("pytest").approx(float(loss_ref), rel=1e-5)
        assert rec["gnorm"] == __import__("pytest").approx(gnorm_ref, rel=1e-4)
