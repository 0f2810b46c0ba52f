"""Full multi-process ``Trainer.train()`` smoke (VERDICT r3 weak #5).

tests/test_multihost.py proves loss/grad parity for two gloo processes at
the level of one jitted step; this test drives the COMPLETE ``Trainer.train()``
— chunked step loop, an eval/checkpoint boundary (val-loss eval with
process-offset batch iterators, multihost ``process_allgather`` sampling,
best/last checkpoint writes), and the final eval — in two real OS processes
wired into one JAX distributed job, and asserts the two processes end in
bit-identical model state:

- identical final EMA parameters (checkpoints compared leaf by leaf),
- identical best_val_loss and step,
- identical i.i.d. samples drawn post-training (the allgather path returns
  the same global array on every process).

Each process writes to its own results_folder so the comparison is between
two independently persisted checkpoints, not one shared file.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
pid, nproc, port, out_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, %(repo)r)
import numpy as np
from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.data.datasets import CGDataset
from twoforone_tpu.data.molecules import FOLDED_PDB_DIR
from twoforone_tpu.data.pdb import load_pdb
from twoforone_tpu.models.graph_transformer import GraphTransformer
from twoforone_tpu.parallel.mesh import initialize_distributed
from twoforone_tpu.train.trainer import Trainer
from twoforone_tpu.utils.config import TrainConfig

assert initialize_distributed(
    "localhost:" + port, num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc

topo = load_pdb(os.path.join(FOLDED_PDB_DIR, "ala2_cg.pdb")).topology
rng = np.random.default_rng(0)
coords = rng.normal(size=(600, 5, 3)).astype(np.float32) * 0.9449
coords -= coords.mean(axis=1, keepdims=True)
mk = lambda a: CGDataset(a, topo, "alanine_fold1")
dataset = (mk(coords[:400]), mk(coords[400:500]), mk(coords[500:]))

model = GraphTransformer(
    num_beads=5, hidden_nf=16, n_layers=1, use_intrinsic_coords=True,
    use_abs_coords=False, use_distances=False, conservative=True,
)
gd = GaussianDiffusion(
    model=model, num_atoms=5, timesteps=1000,
    norm_factor=float(dataset[0].std), loss_weights="ones",
)
results = os.path.join(out_dir, f"proc{pid}")
cfg = TrainConfig(
    mol="alanine_dipeptide_fuberlin",
    data_folder=None,
    results_folder=results,
    tensorboard_folder=os.path.join(results, "runs"),
    experiment_name="mh",
    hidden_features_gnn=16, num_layers_gnn=1,
    conservative=True, use_intrinsic_coords=True,
    use_abs_coords=False, use_distances=False,
    batch_size=32,               # global; each process draws 16
    learning_rate=1e-3,
    train_iter=40,
    eval_interval=20,            # two eval/checkpoint boundaries
    steps_per_host_loop=5,
    num_samples=16,
    num_samples_final_eval=16,
    iterations_on_val=0.5,
    log_tensorboard_interval=10,
    seed=0,
)
trainer = Trainer(gd, dataset, cfg.mol, cfg, use_tensorboard=False,
                  evaluators=False)
trainer.train()

samples = trainer.sample(16, key=jax.random.PRNGKey(99))
np.save(os.path.join(out_dir, f"samples{pid}.npy"), np.asarray(samples))
json.dump(
    {"step": int(trainer.state.step),
     "best_val_loss": float(trainer.best_val_loss),
     "results_folder": trainer.results_folder},
    open(os.path.join(out_dir, f"out{pid}.json"), "w"),
)
"""


def test_two_process_trainer_train_end_to_end(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": REPO})
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]

    recs = [json.loads((tmp_path / f"out{pid}.json").read_text())
            for pid in range(2)]
    # final_eval reloads the best checkpoint, so in-memory step is the best
    # milestone (may be < train_iter); it must agree across processes, and
    # model-last (checked below) must hold the full 40 steps.
    assert recs[0]["step"] == recs[1]["step"]
    assert recs[0]["best_val_loss"] == recs[1]["best_val_loss"]

    # Post-training samples must be THE SAME global array on every process
    # (process_allgather semantics).
    s0 = np.load(tmp_path / "samples0.npy")
    s1 = np.load(tmp_path / "samples1.npy")
    np.testing.assert_array_equal(s0, s1)
    assert np.isfinite(s0).all()

    # The independently persisted checkpoints must agree leaf by leaf.
    from flax import serialization

    def leaves(pid, name):
        path = os.path.join(recs[pid]["results_folder"], f"model-{name}.msgpack")
        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        flat = jax.tree_util.tree_leaves_with_path(state)
        return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}

    import jax

    for name in ("best", "last"):
        a, b = leaves(0, name), leaves(1, name)
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{name}:{k}")
    # the last checkpoint holds the full run
    assert int(leaves(0, "last")["['step']"]) == 40
