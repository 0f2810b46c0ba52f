"""Training runtime for the CG diffusion model.

Capability-parity redesign of reference trainer.py:24-403 for TPU:

- ONE jitted train step containing: on-device SO(3) augmentation, timestep
  importance sampling, loss, grads, AdamW + cosine anneal, and the EMA pytree
  update. The reference's per-step Python work (DataParallel scatter/gather,
  GradScaler, ema-pytorch hooks) collapses into a single XLA program.
- Data parallelism = batch sharded over a 1D mesh (parallel/mesh.py); the
  gradient all-reduce over ICI is inserted by XLA from the shardings
  (replaces torch.nn.DataParallel, reference trainer.py:73-86).
- bf16 compute in the score net replaces torch AMP (trainer.py:141); no loss
  scaler is needed (grads accumulate in f32).
- The KL-at-T invariant (reference asserts every step, models/ddpm.py:334)
  is returned by the step and checked host-side at every loss fetch.
- EMA/eval/checkpoint cadence, early stopping after 10 evals without val
  improvement, best/last checkpoints, TensorBoard scalars, and the final
  large i.i.d. + optional Langevin evaluation all mirror the reference
  (trainer.py:237-399).
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.data.molecules import MASS_ALA2, MASS_FASTFOLDER, temp_dict
from twoforone_tpu.dynamics.langevin import LangevinDiffusion
from twoforone_tpu.evaluate.evaluators import Evaluator, sample_from_model
from twoforone_tpu.ops.geometry import random_rotation
from twoforone_tpu.parallel.mesh import get_mesh, replicate, shard_batch
from twoforone_tpu.train.ema import EMAConfig, ema_update, init_ema
from twoforone_tpu.utils.preempt import exit_if_preempted
from twoforone_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)


class TrainState(NamedTuple):
    params: dict
    ema_params: dict
    opt_state: tuple
    step: jnp.ndarray  # int32 scalar
    # Running max of KL(q(x_T|x_0) || N(0,I)) across ALL steps since the last
    # host fetch — the reference asserts this invariant every step
    # (models/ddpm.py:334); carrying the max on device means no step escapes
    # the check even when the host only fetches at log_tensorboard_interval.
    kl_max: jnp.ndarray = 0.0


def batch_iterator(data: np.ndarray, batch_size: int, seed: int = 0):
    """Infinite shuffled batches, drop_last=True (reference trainer.py:106-127)."""
    rng = np.random.default_rng(seed)
    n = len(data)
    assert n >= batch_size, "dataset smaller than batch size"
    while True:
        perm = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            yield data[perm[i : i + batch_size]]


class Trainer:
    """Trainer for the CG diffusion model. See TrainConfig for options."""

    def __init__(
        self,
        diffusion_model: GaussianDiffusion,
        dataset,  # (train, val, test) CGDatasets
        mol_name: str,
        config,
        mesh=None,
        use_tensorboard: bool = True,
        evaluators: bool = True,
    ):
        # ``evaluators=False`` skips the per-molecule Evaluator machinery
        # (golden-reference TIC/PWD/dihedral scoring) while keeping the loss
        # eval, checkpointing, and sample export. Used by the synthetic
        # production controls (train/positive_control.py), which score with
        # their own ground-truth-aware scorer — and whose molecules (e.g.
        # villin) may have no golden TICA pickle to borrow.
        self.gd = diffusion_model
        self.config = config
        self.mol_name = mol_name
        self.train_data, self.val_data, self.test_data = dataset
        self.mesh = mesh if mesh is not None else get_mesh()
        n_dev = int(np.prod(self.mesh.devices.shape))
        self.batch_size = config.batch_size - (config.batch_size % n_dev)
        # Multi-host: batch_size is GLOBAL; each process draws its local
        # share with a process-offset shuffle seed, and shard_batch stitches
        # the local pieces into one global array (parallel/mesh.py).
        self.process_count = jax.process_count()
        assert self.batch_size % self.process_count == 0
        self.local_batch = self.batch_size // self.process_count
        self.grad_accum = max(1, int(getattr(config, "gradient_accumulate_every", 1) or 1))
        self.train_num_steps = config.train_iter
        self.eval_interval = config.eval_interval
        self.log_interval = max(1, config.log_tensorboard_interval)
        # Device-side step chunking: run K optimizer steps inside one jitted
        # lax.scan per host dispatch. The per-step host work (batch indexing,
        # transfer, dispatch RTT) otherwise caps throughput — on a tunneled
        # TPU at ~20 steps/s vs ~90 the device sustains. Eval/checkpoint
        # cadence rounds to chunk boundaries.
        self.chunk = max(1, int(getattr(config, "steps_per_host_loop", 1) or 1))
        if self.chunk > 1:
            self.eval_interval = max(
                self.chunk, (self.eval_interval // self.chunk) * self.chunk
            )

        # Optimizer: AdamW + cosine anneal to min lr (trainer.py:129-136).
        if config.min_lr_cosine_anneal is not None:
            self.lr_schedule = optax.cosine_decay_schedule(
                init_value=config.learning_rate,
                decay_steps=config.train_iter,
                alpha=config.min_lr_cosine_anneal / config.learning_rate,
            )
        else:
            self.lr_schedule = config.learning_rate
        self.optimizer = optax.adamw(
            learning_rate=self.lr_schedule, weight_decay=config.weight_decay
        )
        self.ema_cfg = EMAConfig(beta=config.ema_decay)

        # Experiment dirs + logging
        exp = config.experiment_name + ("_" if config.experiment_name else "")
        self.results_folder = os.path.join(config.results_folder, exp)
        os.makedirs(self.results_folder, exist_ok=True)
        self.writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(
                    os.path.join(config.tensorboard_folder, exp + "_trn")
                )
            except ImportError:
                pass

        self.evaluator_val = self.evaluator_test = None
        if evaluators:
            self.evaluator_val = Evaluator(
                self.val_data,
                self.train_data.topology,
                mol_name=mol_name,
                eval_folder=self.results_folder,
                data_folder=config.data_folder,
            )
            self.evaluator_test = Evaluator(
                self.test_data,
                self.train_data.topology,
                mol_name=mol_name,
                eval_folder=self.results_folder,
                data_folder=config.data_folder,
            )

        # State
        key = jax.random.PRNGKey(config.seed)
        params = self.gd.init_params(key)
        self.state = TrainState(
            params=replicate(params, self.mesh),
            ema_params=replicate(init_ema(params), self.mesh),
            opt_state=replicate(self.optimizer.init(params), self.mesh),
            step=jnp.int32(0),
            kl_max=jnp.float32(0.0),
        )
        self.best_val_loss = math.inf

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_chunk = jax.jit(self._train_chunk_impl, donate_argnums=(0,))
        self._eval_loss_step = jax.jit(self._eval_loss_impl)
        # Sampling shards its batch axis over the same mesh as training
        # (the reference wraps sampling in DataParallel too, trainer.py:78-80).
        self._sample_fn = self.gd.make_sample_fn(self.batch_size, mesh=self.mesh)

        if config.start_from_last_saved:
            if checkpoint_exists(self.results_folder, "last"):
                self.load("last")
                print("Settings loaded from last checkpoint")
            else:
                print("Not last checkpoint available to load.")

    # ------------------------------------------------------------- jit bodies
    def _train_step_impl(self, state: TrainState, batch, key):
        """One optimizer step. ``batch`` is either ``(B, N, 3)`` (no
        accumulation) or ``(accum, B, N, 3)``: grads of ``loss/accum`` are
        summed over the micro-batches before the single optimizer update,
        each micro-batch independently SO(3)-augmented — exactly the
        reference's accumulation semantics (trainer.py:246-258)."""
        if batch.ndim == 3:
            batch = batch[None]
        accum = batch.shape[0]

        def micro_grads(mb_key, mb):
            aug_key, loss_key = jax.random.split(mb_key)
            if self.config.data_aug:
                mb = random_rotation(mb, aug_key)

            def loss_fn(p):
                return self.gd.loss(p, mb, loss_key)

            return jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        keys = jax.random.split(key, accum)
        if accum == 1:
            (loss, aux), grads = micro_grads(keys[0], batch[0])
            kl_step = aux["kl_at_T"]
        else:
            def body(carry, xs):
                g_acc, loss_acc, kl_acc = carry
                (loss, aux), grads = micro_grads(xs[0], xs[1])
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                return (g_acc, loss_acc + loss,
                        jnp.maximum(kl_acc, aux["kl_at_T"])), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum, kl_step), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0.0), jnp.float32(0.0)), (keys, batch)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = loss_sum / accum

        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.step, self.ema_cfg)
        kl_max = jnp.maximum(jnp.asarray(state.kl_max, jnp.float32), kl_step)
        new_state = TrainState(params, ema_params, opt_state, state.step + 1, kl_max)
        return new_state, {"loss": loss, "kl_at_T": kl_step, "kl_max": kl_max}

    def _train_chunk_impl(self, state: TrainState, batches, keys):
        """K optimizer steps as one lax.scan (one host dispatch).

        ``batches``: (K, B, N, 3) or (K, accum, B, N, 3); ``keys``: (K, 2).
        Returns the state after K steps and the last step's metrics (the
        running-max KL in the state still covers every inner step).
        """

        def body(st, xs):
            b, k = xs
            return self._train_step_impl(st, b, k)

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        last = jax.tree_util.tree_map(lambda a: a[-1], metrics)
        return state, last

    def _eval_loss_impl(self, ema_params, batch, key):
        loss, _ = self.gd.loss(ema_params, batch, key)
        return loss

    # ---------------------------------------------------------------- driving
    def eval_loss(self, data: np.ndarray, val_iters: int, key,
                  partition_name: str = "val") -> float:
        print(f"val iters {val_iters}")
        it = batch_iterator(
            data, self.local_batch,
            seed=(int(key[-1]) + 7919 * jax.process_index()) % (2**31),
        )
        total = 0.0
        for _ in range(val_iters):
            key, sub = jax.random.split(key)
            batch = shard_batch(next(it), self.mesh)
            total += float(self._eval_loss_step(self.state.ema_params, batch, sub))
        loss = total / max(1, val_iters)
        if self.writer is not None:
            self.writer.add_scalar(f"Loss {partition_name}", loss, int(self.state.step))
        print(f"Loss {partition_name} \t {loss}")
        return loss

    def sample(self, num_samples: int, key=None) -> np.ndarray:
        """Sample from the EMA model (all eval/sampling uses EMA,
        reference trainer.py:71, sample.py:154-167). The batch axis is
        sharded over the trainer's mesh; on multi-host jobs every process
        gathers the full sample set for evaluation."""

        def fn(b, k):
            out = self._sample_fn(self.state.ema_params, k)
            if self.process_count > 1:
                from jax.experimental import multihost_utils

                out = multihost_utils.process_allgather(out, tiled=True)
            return out

        return sample_from_model(fn, num_samples, self.batch_size, key=key)

    def save(self, milestone, save_best: bool = False):
        state = {
            "step": int(self.state.step),
            "params": self.state.params,
            "ema_params": self.state.ema_params,
            "opt_state": self.state.opt_state,
            "best_val_loss": self.best_val_loss,
        }
        if self.config.save_all_checkpoints:
            save_checkpoint(self.results_folder, str(milestone), state)
        save_checkpoint(self.results_folder, "last", state)
        if save_best:
            save_checkpoint(self.results_folder, "best", state)
        self.config.to_json(os.path.join(self.results_folder, "config.json"))

    def load(self, milestone: str = "last"):
        template = {
            "step": 0,
            "params": self.state.params,
            "ema_params": self.state.ema_params,
            "opt_state": self.state.opt_state,
            "best_val_loss": 0.0,
        }
        state = load_checkpoint(self.results_folder, str(milestone), template)
        self.best_val_loss = float(state["best_val_loss"])
        self.state = TrainState(
            params=replicate(state["params"], self.mesh),
            ema_params=replicate(state["ema_params"], self.mesh),
            opt_state=replicate(state["opt_state"], self.mesh),
            step=jnp.int32(state["step"]),
            kl_max=jnp.float32(0.0),
        )

    def train(self):
        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed + 1)
        data = np.asarray(self.train_data.data)
        it = batch_iterator(
            data, self.local_batch,
            seed=cfg.seed + 7919 * jax.process_index(),
        )
        val_iters = max(1, int(cfg.iterations_on_val * max(1, len(self.val_data) // self.batch_size)))

        early_stopping_counter = 0
        step = int(self.state.step)
        t_start = time.time()
        profiling = False
        profiled = False
        while step < self.train_num_steps:
            if getattr(cfg, "profile_steps", 0) > 0:
                # Trace a window of steady-state steps (skip compile warmup).
                if step >= 10 and not profiling and not profiled:
                    jax.profiler.start_trace(
                        os.path.join(cfg.tensorboard_folder, "profile")
                    )
                    profiling = True
                elif profiling and step >= 10 + cfg.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                    profiled = True
            key, step_key = jax.random.split(key)
            # Clamp the final chunk so chunked training stops exactly at
            # train_num_steps even when it is not a multiple of the chunk
            # (the remainder chunk re-jits once — negligible).
            chunk = min(self.chunk, self.train_num_steps - step)
            if chunk > 1:
                draw = lambda: (
                    next(it) if self.grad_accum == 1
                    else np.stack([next(it) for _ in range(self.grad_accum)])
                )
                stacked = np.stack([draw() for _ in range(chunk)])
                batch = shard_batch(
                    stacked, self.mesh, batch_axis=1 if self.grad_accum == 1 else 2
                )
                keys = jax.random.split(step_key, chunk)
                self.state, metrics = self._train_chunk(self.state, batch, keys)
            elif self.grad_accum == 1:
                batch = shard_batch(next(it), self.mesh)
                self.state, metrics = self._train_step(self.state, batch, step_key)
            else:
                micro = np.stack([next(it) for _ in range(self.grad_accum)])
                batch = shard_batch(micro, self.mesh, batch_axis=1)
                self.state, metrics = self._train_step(self.state, batch, step_key)
            # Count steps on the host instead of fetching state.step: an
            # int()/float() on the async result would block until the chunk
            # finishes, serializing host batch assembly with device compute
            # (the round-2 dispatch gap, 70 vs 89 steps/s). Metrics are
            # fetched only at log boundaries; the on-device running-max KL
            # means no step escapes the invariant check.
            step += chunk

            if step % self.log_interval < chunk or step >= self.train_num_steps:
                loss = float(metrics["loss"])
                # Running max over ALL steps since start — raising the log
                # interval cannot skip any step's KL-at-T invariant.
                kl = float(metrics["kl_max"])
                assert kl <= 1e-4, (
                    f"Normal KL check at T failed, max value: {kl}"
                )
                if self.writer is not None:
                    self.writer.add_scalar("Loss", loss, step)
                if step % (self.log_interval * 100) < chunk or step <= self.log_interval:
                    rate = step / max(time.time() - t_start, 1e-9)
                    print(f"step {step}/{self.train_num_steps} loss {loss:.4f} ({rate:.1f} it/s)")

            if step != 0 and step % self.eval_interval == 0:
                milestone = step // self.eval_interval
                key, val_key, samp_key = jax.random.split(key, 3)
                val_loss = self.eval_loss(
                    np.asarray(self.val_data.data), val_iters, val_key
                )
                # Sample only when something consumes the samples: the
                # reference samples each eval to feed Evaluator.eval
                # (trainer.py:279-284); with evaluators disabled (production
                # controls) a 2048-sample full reverse chain per eval is
                # minutes of pure waste at N>=35.
                if self.evaluator_val is not None:
                    sampled_mol = self.sample(cfg.num_samples, key=samp_key)
                    results = self.evaluator_val.eval(
                        sampled_mol, milestone=f"{milestone}_iid", save_plots=True
                    )
                    if self.writer is not None:
                        for k, v in results.items():
                            self.writer.add_scalar(k, v, step)

                new_best = val_loss < self.best_val_loss
                self.best_val_loss = val_loss if new_best else self.best_val_loss
                self.save(milestone, save_best=new_best)
                # Milestone just persisted = a lossless pause point: yield
                # the chip if the round-end bench is waiting (utils/preempt).
                exit_if_preempted(f"train milestone {milestone} (step {step})")
                early_stopping_counter = 0 if new_best else early_stopping_counter + 1
                if early_stopping_counter > 9:
                    break

        self.final_eval(key)
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()
        print("Training complete")

    # ------------------------------------------------------------ final eval
    def final_eval(self, key):
        cfg = self.config
        print("\nFinal and larger evaluation")
        if cfg.pick_checkpoint == "best" and checkpoint_exists(self.results_folder, "best"):
            self.load("best")

        key, samp_key = jax.random.split(key)
        sampled_mol = self.sample(cfg.num_samples_final_eval, key=samp_key)
        if "alanine" not in self.mol_name:
            self._save_samples(sampled_mol, "final_iid")

        if self.evaluator_val is not None:
            results_val = self.evaluator_val.eval(
                sampled_mol, milestone="final_iid_val", save_plots=True
            )
            results_test = self.evaluator_test.eval(
                sampled_mol, milestone="final_iid_test", save_plots=False
            )
            if self.writer is not None:
                for k, v in results_val.items():
                    self.writer.add_scalar(k + "_FINAL_iid_val", v)
                for k, v in results_test.items():
                    self.writer.add_scalar(k + "_FINAL_iid_test", v)

        if cfg.eval_langevin:
            self._langevin_eval(key)

    def _langevin_eval(self, key):
        """Post-training Langevin evaluation (reference trainer.py:343-396):
        init chains from 100 training frames, simulate at each configured
        noise level, and run the standard evaluators on the trajectory."""
        cfg = self.config
        temp_data = temp_dict[self.mol_name.upper()]
        rng = np.random.default_rng(0)
        idx = rng.permutation(len(self.train_data))[:100]
        init_mol = np.asarray(self.train_data.data[idx])
        is_ala = "alanine".upper() in self.mol_name.upper()
        mass = MASS_ALA2 if is_ala else MASS_FASTFOLDER
        save_interval = 250 if is_ala else 200

        for t_diff in cfg.langevin_t_diff:
            sampler = LangevinDiffusion(
                self.gd,
                self.state.ema_params,
                init_mol,
                n_timesteps=cfg.langevin_timesteps,
                save_interval=save_interval,
                t=t_diff,
                temp_data=temp_data,
                temp_sim=temp_data,
                dt=cfg.langevin_stepsize,
                masses=[mass] * self.train_data.num_beads,
            )
            sampled_mol = sampler.sample()
            if "alanine" not in self.mol_name:
                self._save_samples(sampled_mol, f"final_langevin_tdiff{t_diff}")
            for evalname, evaluator, plots in (
                ("val", self.evaluator_val, True),
                ("test", self.evaluator_test, False),
            ):
                if evaluator is None:
                    continue
                results = evaluator.eval(
                    sampled_mol,
                    milestone=f"final_langevin_tdiff{t_diff}_{evalname}",
                    save_plots=plots,
                )
                if self.writer is not None:
                    for k, v in results.items():
                        self.writer.add_scalar(
                            k + f"_FINAL_langevin_t{t_diff}_{evalname}", v
                        )

    def _save_samples(self, sampled_mol: np.ndarray, milestone: str):
        """Save samples as .npy plus a 100-frame PDB (reference utils.py:215-218)."""
        from twoforone_tpu.data.pdb import save_pdb

        np.save(os.path.join(self.results_folder, f"sample-{milestone}.npy"), sampled_mol)
        save_pdb(
            os.path.join(self.results_folder, f"sample-{milestone}.pdb"),
            sampled_mol[:100],
            self.train_data.topology,
        )
