"""Training-throughput benchmark: steps/sec of the full jitted train step
(chignolin shipped config: nf=64, 3 layers, batch 512, conservative).

``--trainer [chunk]`` instead drives the real Trainer end to end on a
synthetic dataset (chunk = steps_per_host_loop; default compares 1 vs 50).
The raw-step metric overstates what Trainer.train() can sustain on a
latency-bound host (async dispatch pipelines 50 steps); the trainer metric
includes batch prep + the per-loop host sync, which device-side chunking
amortizes."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_trainer(chunk: int, steps: int = 400):
    """steps/s of Trainer.train() (chignolin config, synthetic data)."""
    import time

    import jax

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.data.datasets import CGDataset
    from twoforone_tpu.data.molecules import FOLDED_PDB_DIR, Molecules
    from twoforone_tpu.data.pdb import load_pdb
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.train.trainer import Trainer
    from twoforone_tpu.utils.config import TrainConfig

    import tempfile

    rng = np.random.default_rng(0)
    data = rng.normal(size=(20000, 10, 3)).astype(np.float32) * 3.1
    topo = load_pdb(os.path.join(FOLDED_PDB_DIR, "CLN025-0-c-alpha.pdb")).topology
    mk = lambda a: CGDataset(a, topo, Molecules.CHIGNOLIN, mean0=True)
    out = tempfile.mkdtemp(prefix="bench_train_")
    model = GraphTransformer(
        num_beads=10, hidden_nf=64, n_layers=3, use_intrinsic_coords=True,
        use_abs_coords=False, use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(model=model, num_atoms=10, timesteps=1000,
                           norm_factor=3.11, loss_weights="higheruntil_100")
    cfg = TrainConfig(
        mol="chignolin", data_folder=None, results_folder=out,
        tensorboard_folder=os.path.join(out, "runs"),
        batch_size=512, train_iter=steps, eval_interval=10**9,
        steps_per_host_loop=chunk, log_tensorboard_interval=10**9,
        num_samples=64, num_samples_final_eval=64, eval_langevin=False,
    )
    trainer = Trainer(gd, (mk(data), mk(data[:2048]), mk(data[:2048])),
                      "chignolin", cfg, use_tensorboard=False)
    trainer.final_eval = lambda key: None  # time the drive loop only

    # warmup run (compile)
    trainer.train_num_steps = 2 * chunk
    trainer.train()

    start = int(trainer.state.step)
    trainer.train_num_steps = start + steps
    t0 = time.perf_counter()
    trainer.train()
    dt = time.perf_counter() - t0
    return (int(trainer.state.step) - start) / dt


def main():
    import jax

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import optax

    from twoforone_tpu.ops.geometry import random_rotation
    from twoforone_tpu.train.ema import EMAConfig, ema_update, init_ema
    from __graft_entry__ import _flagship

    model, gd = _flagship()
    params = gd.init_params(jax.random.PRNGKey(0))
    optimizer = optax.adamw(4e-4, weight_decay=1e-12)
    opt_state = optimizer.init(params)
    ema_params = init_ema(params)
    ema_cfg = EMAConfig()

    batch = 512
    data = np.random.default_rng(0).normal(size=(batch, 10, 3)).astype(np.float32)
    data = (data - data.mean(axis=1, keepdims=True)) * gd.norm_factor

    @jax.jit
    def step(params, ema_params, opt_state, s, batch, key):
        k1, k2 = jax.random.split(key)
        batch = random_rotation(batch, k1)
        (loss, aux), grads = jax.value_and_grad(
            lambda p: gd.loss(p, batch, k2), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, s, ema_cfg)
        return params, ema_params, opt_state, loss

    key = jax.random.PRNGKey(1)
    x = jnp.asarray(data)
    for i in range(3):  # warmup/compile
        key, sk = jax.random.split(key)
        params, ema_params, opt_state, loss = step(params, ema_params, opt_state, i, x, sk)
    jax.block_until_ready(loss)

    n = 50
    t0 = time.perf_counter()
    for i in range(n):
        key, sk = jax.random.split(key)
        params, ema_params, opt_state, loss = step(
            params, ema_params, opt_state, i + 3, x, sk
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_steps_per_sec_chignolin_bs512",
        "value": round(n / dt, 2),
        "unit": "steps/s",
        "samples_per_sec": round(n * batch / dt, 1),
    }))


def main_trainer():
    import json

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    chunks = [int(a) for a in sys.argv[2:]] or [1, 50]
    out = {}
    for c in chunks:
        out[f"trainer_steps_per_sec_chunk{c}"] = round(bench_trainer(c), 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--trainer":
        main_trainer()
    else:
        main()
