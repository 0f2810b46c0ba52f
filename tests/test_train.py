import os

import jax
import numpy as np
import pytest

from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.data.datasets import CGDataset, get_dataset
from twoforone_tpu.models import get_model
from twoforone_tpu.train.ema import EMAConfig, current_decay, ema_update, init_ema
from twoforone_tpu.train.trainer import Trainer, batch_iterator
from twoforone_tpu.utils.config import TrainConfig


def test_ema_schedule_matches_ema_pytorch_semantics():
    cfg = EMAConfig(beta=0.995)
    # before update_after_step: decay 0 (copy)
    assert float(current_decay(0, cfg)) == 0.0
    assert float(current_decay(100, cfg)) == 0.0
    assert float(current_decay(101, cfg)) == 0.0  # epoch = 0 -> still copy
    # ramping afterwards: 1 - (1 + epoch)^(-2/3)
    d = float(current_decay(110, cfg))
    assert d == pytest.approx(1 - (1 + 9) ** (-2 / 3), rel=1e-5)
    # far in: clamped to beta
    assert float(current_decay(100000, cfg)) == pytest.approx(0.995)


def test_ema_update_every_and_copy():
    import jax.numpy as jnp

    cfg = EMAConfig(beta=0.9, update_after_step=2, update_every=2, power=1.0)
    params = {"w": jnp.ones(3)}
    ema = init_ema({"w": jnp.zeros(3)})
    # step 1: not a multiple of 2 -> unchanged
    ema1 = ema_update(ema, params, 1, cfg)
    np.testing.assert_array_equal(np.asarray(ema1["w"]), 0.0)
    # step 2: multiple of 2, epoch<=0 -> copy
    ema2 = ema_update(ema, params, 2, cfg)
    np.testing.assert_array_equal(np.asarray(ema2["w"]), 1.0)


def test_batch_iterator_shapes_and_coverage():
    data = np.arange(10 * 2 * 3, dtype=np.float32).reshape(10, 2, 3)
    it = batch_iterator(data, 4, seed=0)
    seen = set()
    for _ in range(6):
        b = next(it)
        assert b.shape == (4, 2, 3)
        seen.update(b[:, 0, 0].astype(int).tolist())
    assert len(seen) >= 8  # epochs reshuffle, most of dataset covered


def _synthetic_ala2_dataset(n=512):
    """Gaussian blob 'molecules' centered at zero, std ~ ala2 scale."""
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(n, 5, 3)).astype(np.float32) * 0.9449278712272644
    coords -= coords.mean(axis=1, keepdims=True)
    train, val, test = (
        CGDataset(coords[: n // 2], _topo(), "alanine_fold1"),
        CGDataset(coords[n // 2 : 3 * n // 4], _topo(), "alanine_fold1"),
        CGDataset(coords[3 * n // 4 :], _topo(), "alanine_fold1"),
    )
    return train, val, test


def _topo():
    from twoforone_tpu.data.molecules import FOLDED_PDB_DIR
    from twoforone_tpu.data.pdb import load_pdb

    return load_pdb(os.path.join(FOLDED_PDB_DIR, "ala2_cg.pdb")).topology


@pytest.mark.slow
def test_trainer_end_to_end_tiny(tmp_path):
    """Two eval cycles of real training on synthetic data: loss decreases,
    checkpoints + config + eval artifacts written, resume works."""
    cfg = TrainConfig(
        mol="alanine_dipeptide_fuberlin",
        data_folder=None,
        results_folder=str(tmp_path / "results"),
        tensorboard_folder=str(tmp_path / "runs"),
        experiment_name="tiny",
        hidden_features_gnn=16,
        num_layers_gnn=1,
        conservative=True,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        diffusion_steps=1000,
        batch_size=32,
        learning_rate=1e-3,
        train_iter=40,
        eval_interval=20,
        num_samples=8,
        num_samples_final_eval=8,
        iterations_on_val=1,
        log_tensorboard_interval=10,
        loss_weights="higheruntil_100",
    )
    dataset = _synthetic_ala2_dataset()
    model = get_model(cfg, 5)
    gd = GaussianDiffusion(
        model=model, num_atoms=5, timesteps=cfg.diffusion_steps,
        norm_factor=dataset[0].std, loss_weights=cfg.loss_weights,
    )
    trainer = Trainer(gd, dataset, cfg.mol, cfg, use_tensorboard=False)
    trainer.train()

    rf = trainer.results_folder
    assert os.path.exists(os.path.join(rf, "model-last.msgpack"))
    assert os.path.exists(os.path.join(rf, "model-best.msgpack"))
    assert os.path.exists(os.path.join(rf, "config.json"))
    assert os.path.exists(os.path.join(rf, "results-final_iid_val.json"))
    # final_eval reloads the best checkpoint (reference trainer.py:313-314),
    # so in-memory step may be the best milestone; model-last must hold 40.
    from twoforone_tpu.utils.checkpoint import load_checkpoint

    assert int(load_checkpoint(rf, "last")["step"]) == 40

    # resume from last
    import dataclasses

    cfg2 = dataclasses.replace(cfg, start_from_last_saved=True, train_iter=44)
    trainer2 = Trainer(gd, dataset, cfg.mol, cfg2, use_tensorboard=False)
    assert int(trainer2.state.step) == 40
    assert trainer2.best_val_loss == trainer.best_val_loss


@pytest.mark.slow
def test_trainer_loss_decreases(tmp_path):
    cfg = TrainConfig(
        mol="alanine_dipeptide_fuberlin",
        data_folder=None,
        results_folder=str(tmp_path / "results"),
        experiment_name="lossdec",
        hidden_features_gnn=32,
        num_layers_gnn=1,
        conservative=False,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        diffusion_steps=1000,
        batch_size=64,
        learning_rate=2e-3,
        train_iter=150,
        eval_interval=1000,  # no mid-eval
        iterations_on_val=1,
        log_tensorboard_interval=1000,
    )
    dataset = _synthetic_ala2_dataset(1024)
    model = get_model(cfg, 5)
    gd = GaussianDiffusion(
        model=model, num_atoms=5, timesteps=1000,
        norm_factor=dataset[0].std, loss_weights="ones",
    )
    trainer = Trainer(gd, dataset, cfg.mol, cfg, use_tensorboard=False)
    # measure loss before and after a few steps manually
    key = jax.random.PRNGKey(123)
    data = dataset[0].data
    it = batch_iterator(data, trainer.batch_size, seed=1)
    losses = []
    for i in range(150):
        key, sk = jax.random.split(key)
        trainer.state, metrics = trainer._train_step(trainer.state, next(it), sk)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.9


def _tiny_trainer(tmp_path, name, **overrides):
    cfg = TrainConfig(
        mol="alanine_dipeptide_fuberlin",
        data_folder=None,
        results_folder=str(tmp_path / f"results_{name}"),
        experiment_name=name,
        hidden_features_gnn=16,
        num_layers_gnn=1,
        conservative=False,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        diffusion_steps=1000,
        batch_size=32,
        learning_rate=1e-3,
        train_iter=10,
        eval_interval=1000,
        iterations_on_val=1,
        log_tensorboard_interval=1000,
        data_aug=True,
        **overrides,
    )
    dataset = _synthetic_ala2_dataset(256)
    model = get_model(cfg, 5)
    gd = GaussianDiffusion(
        model=model, num_atoms=5, timesteps=1000,
        norm_factor=dataset[0].std, loss_weights="ones",
    )
    return Trainer(gd, dataset, cfg.mol, cfg, use_tensorboard=False), dataset


def test_gradient_accumulation_matches_manual_grads(tmp_path):
    """accum=k: the step's parameter update equals one optimizer update with
    the mean of the k per-micro-batch gradients (each micro-batch rotated
    with its own subkey) — the reference's loss/accum summation semantics
    (reference trainer.py:246-258)."""
    import jax.numpy as jnp
    import optax

    from twoforone_tpu.ops.geometry import random_rotation

    from twoforone_tpu.train.trainer import TrainState

    trainer, dataset = _tiny_trainer(tmp_path, "accum")
    gd = trainer.gd
    data = dataset[0].data
    k = 3
    batch = np.stack([data[i * 32 : (i + 1) * 32] for i in range(k)])
    step_key = jax.random.PRNGKey(7)

    # Swap in SGD(lr=1) so params0 - params1 IS the applied gradient (AdamW's
    # m/sqrt(v) normalization is invariant to gradient scaling, which would
    # hide a wrong /k), and re-jit the step with the new optimizer.
    trainer.optimizer = optax.sgd(1.0)
    state0 = trainer.state
    trainer.state = TrainState(
        params=state0.params,
        ema_params=state0.ema_params,
        opt_state=trainer.optimizer.init(state0.params),
        step=state0.step,
        kl_max=jnp.float32(0.0),
    )
    trainer._train_step = jax.jit(trainer._train_step_impl)
    params0 = jax.tree_util.tree_map(np.asarray, state0.params)

    # Manual mean-of-micro-batch gradients with the same key schedule.
    keys = jax.random.split(step_key, k)
    grads_sum = None
    loss_sum = 0.0
    for i in range(k):
        aug_key, loss_key = jax.random.split(keys[i])
        mb = random_rotation(jnp.asarray(batch[i]), aug_key)
        (loss, _), g = jax.value_and_grad(
            lambda p: gd.loss(p, mb, loss_key), has_aux=True
        )(state0.params)
        loss_sum += float(loss)
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g
        )
    grads_manual = jax.tree_util.tree_map(
        lambda x: np.asarray(x) / k, grads_sum
    )

    new_state, metrics = trainer._train_step(trainer.state, jnp.asarray(batch), step_key)

    applied = jax.tree_util.tree_map(
        lambda a, b: a - np.asarray(b), params0, new_state.params
    )
    flat_a = jax.tree_util.tree_leaves(applied)
    flat_b = jax.tree_util.tree_leaves(grads_manual)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert float(metrics["loss"]) == pytest.approx(loss_sum / k, rel=1e-4)
    assert int(new_state.step) == 1  # ONE optimizer step for k micro-batches


@pytest.mark.slow
def test_gradient_accumulation_trains(tmp_path):
    """Loss decreases through the accumulation path end to end."""
    import jax.numpy as jnp

    trainer, dataset = _tiny_trainer(tmp_path, "acctrain",
                                     gradient_accumulate_every=2)
    data = dataset[0].data
    it = batch_iterator(data, trainer.batch_size, seed=1)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(80):
        key, sk = jax.random.split(key)
        micro = np.stack([next(it) for _ in range(2)])
        trainer.state, metrics = trainer._train_step(trainer.state, jnp.asarray(micro), sk)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-15:]) < np.mean(losses[:15]) * 0.95


def test_kl_running_max_carried_in_state(tmp_path):
    """kl_max is monotone non-decreasing and >= every step's kl_at_T, so the
    invariant check cannot be skipped by a large log interval (reference
    asserts every step, models/ddpm.py:334)."""
    trainer, dataset = _tiny_trainer(tmp_path, "klmax")
    data = dataset[0].data
    it = batch_iterator(data, trainer.batch_size, seed=2)
    key = jax.random.PRNGKey(11)
    prev_max = 0.0
    for _ in range(5):
        key, sk = jax.random.split(key)
        trainer.state, metrics = trainer._train_step(trainer.state, next(it), sk)
        kl, kl_max = float(metrics["kl_at_T"]), float(metrics["kl_max"])
        assert kl_max >= kl
        assert kl_max >= prev_max
        prev_max = kl_max
    assert float(trainer.state.kl_max) == pytest.approx(prev_max)
    assert prev_max <= 1e-4  # the invariant itself holds on real schedules


def test_step_chunking_matches_sequential_steps(tmp_path):
    """K steps through the device-side chunk scan == K sequential calls of
    the single-step impl with the same key schedule (exact: same jaxpr per
    step, same RNG)."""
    import jax.numpy as jnp

    import optax

    from twoforone_tpu.train.trainer import TrainState

    trainer, dataset = _tiny_trainer(tmp_path, "chunk")
    data = dataset[0].data
    k = 3
    batches = jnp.asarray(np.stack([data[i * 32 : (i + 1) * 32] for i in range(k)]))
    keys = jax.random.split(jax.random.PRNGKey(5), k)

    # SGD instead of AdamW: Adam's m/sqrt(v) normalization acts like
    # lr*sign(grad) on the first steps, so any float-reassociation noise
    # between the eager sequential path and the fused scan flips whole
    # updates — comparing them is ill-conditioned. With SGD the update is
    # linear in the gradient and the paths agree to float noise.
    trainer.optimizer = optax.sgd(0.1)
    st0 = trainer.state
    trainer.state = TrainState(
        params=st0.params, ema_params=st0.ema_params,
        opt_state=trainer.optimizer.init(st0.params),
        step=st0.step, kl_max=jnp.float32(0.0),
    )

    state_seq = trainer.state
    for i in range(k):
        state_seq, metrics_seq = trainer._train_step_impl(
            state_seq, batches[i], keys[i]
        )

    state_chunk, metrics_chunk = trainer._train_chunk_impl(
        trainer.state, batches, keys
    )

    assert int(state_chunk.step) == k
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-4
        ),
        state_seq.params, state_chunk.params,
    )
    np.testing.assert_allclose(
        float(metrics_chunk["loss"]), float(metrics_seq["loss"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(state_chunk.kl_max), float(state_seq.kl_max), rtol=1e-3, atol=1e-8
    )


def test_trainer_chunked_drive_loop(tmp_path):
    """Trainer.train() with steps_per_host_loop > 1 completes, advances the
    step counter in chunks, and keeps the KL invariant visible."""
    trainer, _ = _tiny_trainer(tmp_path, "chunkdrive", steps_per_host_loop=5,
                               num_samples=32, num_samples_final_eval=32)
    trainer.train()
    assert int(trainer.state.step) >= 10
    assert float(trainer.state.kl_max) <= 1e-4


def test_trainer_chunked_stops_exactly_at_train_iter(tmp_path):
    """The final chunk is clamped: train_iter not a multiple of
    steps_per_host_loop must not overshoot (ends at exactly train_iter)."""
    trainer, _ = _tiny_trainer(tmp_path, "chunkclamp", steps_per_host_loop=4,
                               num_samples=32, num_samples_final_eval=32)
    trainer.train()
    assert int(trainer.state.step) == 10


def test_get_model_rejects_unplumbed_flags():
    """Non-default values for reference flags that never reach the model
    must raise instead of silently training a different model than asked
    (the reference parses-and-drops them, main_train.py:84,168-192,256)."""
    base = dict(hidden_features_gnn=16, num_layers_gnn=1,
                use_intrinsic_coords=True, use_abs_coords=False,
                use_distances=False, conservative=True)
    # defaults pass
    get_model(TrainConfig(**base), 5)
    for flag, bad_value in [
        ("use_rbf", True), ("residual_edge", False),
        ("graph_mlp_decoder", True), ("gnn_efficient", True),
        ("use_layernorm", False), ("sum_energies", False),
    ]:
        with pytest.raises(ValueError, match=flag):
            get_model(TrainConfig(**base, **{flag: bad_value}), 5)
