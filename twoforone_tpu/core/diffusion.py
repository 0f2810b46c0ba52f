"""DDPM over coarse-grained coordinates — pure-functional JAX core.

Capability-parity redesign of the reference ``GaussianDiffusion``
(models/ddpm.py:20-337). Differences are all about the XLA compilation model,
not numerics:

- every buffer lives in an immutable :class:`DiffusionBuffers` pytree,
- the reverse chain ``p_sample_loop`` is a ``lax.scan`` over T steps compiled
  into ONE XLA program (the reference runs a Python loop with one kernel
  launch batch per step, models/ddpm.py:234-254),
- the training loss is a pure function of (params, batch, rng) ready for
  ``jax.grad`` + data-parallel sharding,
- the KL-at-T sanity check (models/ddpm.py:173-193) is computed on-device and
  returned as an aux metric; callers assert on the host (assert-in-jit would
  force a sync every step).

Numerical contract kept exactly: zero-CoM projection of data, noise, model
output and every sampling step; per-protein std normalization; clamp to
±1000 inside the sampling loop; timestep *importance sampling* from the
loss-weight multinomial (models/ddpm.py:333) rather than loss reweighting.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from twoforone_tpu.core.schedules import DiffusionBuffers, extract, make_buffers
from twoforone_tpu.ops.geometry import center_zero

ScoreFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x, t_norm) -> eps_hat


# ---------------------------------------------------------------------------
# Stateless math
# ---------------------------------------------------------------------------

def q_sample(buf: DiffusionBuffers, x_start, t, noise):
    """Forward-process sample x_t | x_0 (reference models/ddpm.py:265-274)."""
    noise = center_zero(noise)
    return (
        extract(buf.sqrt_alphas_cumprod, t) * x_start
        + extract(buf.sqrt_one_minus_alphas_cumprod, t) * noise
    )


def predict_start_from_noise(buf: DiffusionBuffers, x_t, t, noise):
    """Invert q_sample for x_0 (reference models/ddpm.py:140-147)."""
    return (
        extract(buf.sqrt_recip_alphas_cumprod, t) * x_t
        - extract(buf.sqrt_recipm1_alphas_cumprod, t) * noise
    )


def q_posterior(buf: DiffusionBuffers, x_start, x_t, t):
    """Posterior q(x_{t-1} | x_t, x_0) (reference models/ddpm.py:149-161)."""
    mean = (
        extract(buf.posterior_mean_coef1, t) * x_start
        + extract(buf.posterior_mean_coef2, t) * x_t
    )
    var = extract(buf.posterior_variance, t)
    log_var = extract(buf.posterior_log_variance_clipped, t)
    return mean, var, log_var


def q_mean_variance(buf: DiffusionBuffers, x_start, t):
    """Marginal q(x_t | x_0) (reference models/ddpm.py:163-171)."""
    mean = extract(buf.sqrt_alphas_cumprod, t) * x_start
    variance = extract(1.0 - buf.alphas_cumprod, t)
    log_variance = extract(buf.log_one_minus_alphas_cumprod, t)
    return mean, variance, log_variance


def normal_kl_at_T(buf: DiffusionBuffers, x_start):
    """max over batch of KL(q(x_T | x_0) || N(0, I)) (models/ddpm.py:173-193).

    Returned as a value; callers assert ``<= 1e-4`` on host. x_start must be
    centered and normalized.
    """
    b = x_start.shape[0]
    t = jnp.full((b,), buf.num_timesteps - 1, dtype=jnp.int32)
    mean1, _, logvar1 = q_mean_variance(buf, x_start, t)
    logvar1 = logvar1[:, 0, 0]
    meandifsq = jnp.sum(mean1**2, axis=(-2, -1))
    kl = 0.5 * (-1.0 - logvar1 + jnp.exp(logvar1) + meandifsq)
    return jnp.max(jnp.abs(kl))


def p_mean_variance(buf: DiffusionBuffers, score_fn: ScoreFn, x, t, objective="pred_noise"):
    """Model posterior estimate (reference models/ddpm.py:195-219)."""
    t_norm = t.astype(jnp.float32) / buf.num_timesteps
    model_output = center_zero(score_fn(x, t_norm))
    if objective == "pred_noise":
        x_start = center_zero(predict_start_from_noise(buf, x, t, model_output))
    elif objective == "pred_x0":
        x_start = model_output
    else:
        raise ValueError(f"unknown objective {objective}")
    return q_posterior(buf, x_start, x, t)


def p_sample(buf: DiffusionBuffers, score_fn: ScoreFn, x, t, key, objective="pred_noise"):
    """One ancestral reverse step (reference models/ddpm.py:221-232)."""
    model_mean, _, model_log_var = p_mean_variance(buf, score_fn, x, t, objective)
    noise = center_zero(jax.random.normal(key, x.shape, dtype=x.dtype))
    nonzero = (t != 0).astype(x.dtype)[:, None, None]
    return model_mean + nonzero * jnp.exp(0.5 * model_log_var) * noise


def p_sample_loop(
    buf: DiffusionBuffers,
    score_fn: ScoreFn,
    shape,
    key,
    objective: str = "pred_noise",
    mesh=None,
):
    """Full reverse chain as one lax.scan (reference models/ddpm.py:234-254).

    The blow-up guard (clamp to ±1000, models/ddpm.py:248-250) is applied
    unconditionally — a no-op whenever values are in range.

    ``mesh``: optional jax.sharding.Mesh — constrains the batch axis to shard
    over its devices (threefry is partitionable, so the sharded chain is
    bitwise-identical to the single-device one). shape[0] must be divisible
    by the mesh size.
    """
    key, init_key = jax.random.split(key)
    mol = center_zero(jax.random.normal(init_key, shape, dtype=jnp.float32))
    if mesh is not None:
        from twoforone_tpu.parallel.mesh import chain_sharding, mesh_size

        if mesh_size(mesh) > 1:
            assert shape[0] % mesh_size(mesh) == 0, (
                f"batch {shape[0]} must be divisible by mesh size {mesh_size(mesh)}"
            )
            mol = jax.lax.with_sharding_constraint(mol, chain_sharding(mesh))
    b = shape[0]

    def step(mol, t_scalar):
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        step_key = jax.random.fold_in(key, t_scalar)
        mol = p_sample(buf, score_fn, mol, t, step_key, objective)
        mol = jnp.clip(mol, -1000.0, 1000.0)
        mol = center_zero(mol)
        return mol, None

    ts = jnp.arange(buf.num_timesteps - 1, -1, -1)
    mol, _ = jax.lax.scan(step, mol, ts)
    return mol


def ddim_timestep_ladder(num_timesteps: int, sample_steps: int):
    """Evenly spaced descending timestep subset for strided sampling.

    Improved-DDPM-style respacing (Nichol & Dhariwal 2021, arXiv:2102.09672
    §4; PAPERS.md): ``sample_steps`` indices evenly spaced over [0, T-1],
    always containing both endpoints, descending. Returned as (taus,
    prev_taus) where prev_taus[i] is the ladder step AFTER taus[i]
    (prev_taus[-1] = -1 signals the final hop to x_0).
    """
    import numpy as np

    assert 1 <= sample_steps <= num_timesteps, (
        f"sample_steps={sample_steps} must be in [1, {num_timesteps}]"
    )
    # linspace from the top so sample_steps=1 yields [T-1] (one hop to x0)
    taus = np.unique(
        np.round(np.linspace(num_timesteps - 1, 0, sample_steps)).astype(np.int64)
    )[::-1]
    prev = np.concatenate([taus[1:], [-1]])
    return jnp.asarray(taus.copy()), jnp.asarray(prev)


def ddim_step(buf: DiffusionBuffers, score_fn: ScoreFn, x, tau, tau_prev, key,
              eta: float = 0.0, objective: str = "pred_noise",
              clip_x0: Optional[float] = 10.0):
    """One DDIM update x_tau -> x_tau_prev (Song et al. 2020, eq. 12).

    With a full ladder, eta=1 and ``clip_x0=None`` this reduces exactly to
    the ancestral :func:`p_sample` step (sigma^2 == the DDPM posterior
    variance and the means coincide algebraically — test_ddim.py asserts
    the equivalence numerically); eta=0 is the deterministic DDIM ODE
    corrector. Keeps the framework's invariants: model output, x0 estimate,
    injected noise and the state are all zero-CoM projected.

    ``clip_x0`` clamps the x0 estimate (the standard clip-denoised guard):
    at the top of the cosine schedule ``1/sqrt(abar_t)`` is ~2e4, so
    predict_start_from_noise amplifies model eps error by that factor. The
    ancestral chain is immune (its posterior coefficients cancel the
    amplification and the state is mostly replaced by fresh noise at high
    t), but DDIM carries x0 forward with weight sqrt(abar_prev) — unclipped
    it diverges with any imperfect score net (measured: sample std ~300 vs
    data std 1.3 on the trained chain10 control). Coordinates are
    normalized to unit std, so 10 is far outside the data range and only
    engages on amplified noise.
    """
    b = x.shape[0]
    t = jnp.full((b,), tau, dtype=jnp.int32)
    t_norm = t.astype(jnp.float32) / buf.num_timesteps
    model_output = center_zero(score_fn(x, t_norm))
    abar_t = extract(buf.alphas_cumprod, t)
    if objective == "pred_noise":
        eps = model_output
        x0 = center_zero(predict_start_from_noise(buf, x, t, eps))
    elif objective == "pred_x0":
        x0 = model_output
        eps = (x - jnp.sqrt(abar_t) * x0) / jnp.sqrt(1.0 - abar_t)
    else:
        raise ValueError(f"unknown objective {objective}")
    if clip_x0 is not None:
        x0 = center_zero(jnp.clip(x0, -clip_x0, clip_x0))
        # keep (x0, eps) consistent with the current state (diffusers'
        # clip_sample convention); a no-op when the clamp did not engage
        eps = (x - jnp.sqrt(abar_t) * x0) / jnp.sqrt(1.0 - abar_t)

    last = tau_prev < 0  # final hop: x_0 directly, no noise
    t_prev = jnp.full((b,), jnp.maximum(tau_prev, 0), dtype=jnp.int32)
    abar_prev = jnp.where(last, 1.0, extract(buf.alphas_cumprod, t_prev))
    sigma = eta * jnp.sqrt(
        jnp.clip((1.0 - abar_prev) / (1.0 - abar_t), 0.0)
        * jnp.clip(1.0 - abar_t / abar_prev, 0.0)
    )
    dir_coef = jnp.sqrt(jnp.clip(1.0 - abar_prev - sigma**2, 0.0))
    noise = center_zero(jax.random.normal(key, x.shape, dtype=x.dtype))
    keep_noise = jnp.where(last, 0.0, 1.0)
    return jnp.sqrt(abar_prev) * x0 + dir_coef * eps + keep_noise * sigma * noise


def ddim_sample_loop(
    buf: DiffusionBuffers,
    score_fn: ScoreFn,
    shape,
    key,
    sample_steps: int,
    eta: float = 0.0,
    objective: str = "pred_noise",
    mesh=None,
    clip_x0: Optional[float] = 10.0,
):
    """Strided reverse chain as one lax.scan — ``sample_steps`` score-net
    evaluations instead of T (throughput scales ~T/sample_steps).

    No reference equivalent (the reference always runs the full T=1000
    ancestral loop, models/ddpm.py:234-254); the blow-up clamp, zero-CoM
    projection, per-step fold_in RNG and mesh batch sharding follow
    :func:`p_sample_loop` exactly.
    """
    key, init_key = jax.random.split(key)
    mol = center_zero(jax.random.normal(init_key, shape, dtype=jnp.float32))
    if mesh is not None:
        from twoforone_tpu.parallel.mesh import chain_sharding, mesh_size

        if mesh_size(mesh) > 1:
            assert shape[0] % mesh_size(mesh) == 0, (
                f"batch {shape[0]} must be divisible by mesh size {mesh_size(mesh)}"
            )
            mol = jax.lax.with_sharding_constraint(mol, chain_sharding(mesh))

    taus, prev_taus = ddim_timestep_ladder(buf.num_timesteps, sample_steps)

    def step(mol, tau_pair):
        tau, tau_prev = tau_pair
        step_key = jax.random.fold_in(key, tau)
        mol = ddim_step(buf, score_fn, mol, tau, tau_prev, step_key, eta,
                        objective, clip_x0)
        mol = jnp.clip(mol, -1000.0, 1000.0)
        mol = center_zero(mol)
        return mol, None

    mol, _ = jax.lax.scan(step, mol, (taus, prev_taus))
    return mol


def dpm_solver_pp_2m_loop(
    buf: DiffusionBuffers,
    score_fn: ScoreFn,
    shape,
    key,
    sample_steps: int,
    objective: str = "pred_noise",
    mesh=None,
    clip_x0: Optional[float] = 10.0,
):
    """DPM-Solver++(2M): second-order multistep ODE sampler (Lu et al. 2022,
    arXiv:2211.01095, data-prediction formulation) as one lax.scan.

    One score-net evaluation per step like DDIM, but each update extrapolates
    the x0 prediction linearly in log-SNR from the previous evaluation —
    second-order accuracy at first-order cost WHEN the score error is small
    (clearly wins on the analytic-score Gaussian, tests/test_ddim.py). With
    an imperfect trained score the extrapolation amplifies model error: on
    the trained chain10 control DDIM matched it at 50-100 steps and beat it
    at 10-20 (docs/PERF_NOTES.md quality ladder), so DDIM remains the
    production default. No reference equivalent (the reference always runs
    the full T=1000 ancestral loop, models/ddpm.py:234-254).

    Conventions match :func:`ddim_sample_loop`: the Nichol-Dhariwal respaced
    ladder (:func:`ddim_timestep_ladder`), zero-CoM projection and the ±1000
    clamp every step, the same ``clip_x0`` denoised-estimate guard, and mesh
    batch sharding. The final hop (tau_prev < 0, i.e. abar -> 1 so
    sigma -> 0 and lambda -> +inf) is taken at first order ("lower-order
    final", the standard stabilization for small step counts): the update
    limit is exactly x = x0_hat, matching DDIM's final hop.
    """
    key, init_key = jax.random.split(key)
    mol = center_zero(jax.random.normal(init_key, shape, dtype=jnp.float32))
    if mesh is not None:
        from twoforone_tpu.parallel.mesh import chain_sharding, mesh_size

        if mesh_size(mesh) > 1:
            assert shape[0] % mesh_size(mesh) == 0, (
                f"batch {shape[0]} must be divisible by mesh size {mesh_size(mesh)}"
            )
            mol = jax.lax.with_sharding_constraint(mol, chain_sharding(mesh))

    taus, prev_taus = ddim_timestep_ladder(buf.num_timesteps, sample_steps)
    b = shape[0]

    def x0_from_model(x, tau):
        t = jnp.full((b,), tau, dtype=jnp.int32)
        t_norm = t.astype(jnp.float32) / buf.num_timesteps
        model_output = center_zero(score_fn(x, t_norm))
        if objective == "pred_noise":
            x0 = center_zero(predict_start_from_noise(buf, x, t, model_output))
        elif objective == "pred_x0":
            x0 = model_output
        else:
            raise ValueError(f"unknown objective {objective}")
        if clip_x0 is not None:
            x0 = center_zero(jnp.clip(x0, -clip_x0, clip_x0))
        return x0

    def log_snr_half(abar):  # lambda = log(alpha/sigma) = 0.5 log(abar/(1-abar))
        return 0.5 * (jnp.log(abar) - jnp.log1p(-abar))

    def step(carry, tau_pair):
        x, x0_prev, lam_prev, first = carry
        tau, tau_prev = tau_pair
        x0_s = x0_from_model(x, tau)
        abar_s = buf.alphas_cumprod[tau]
        lam_s = log_snr_half(abar_s)
        sigma_s = jnp.sqrt(1.0 - abar_s)

        last = tau_prev < 0
        abar_t = jnp.where(last, 1.0,
                           buf.alphas_cumprod[jnp.maximum(tau_prev, 0)])
        alpha_t = jnp.sqrt(abar_t)
        sigma_t = jnp.where(last, 0.0, jnp.sqrt(1.0 - abar_t))
        lam_t = jnp.where(last, lam_s, log_snr_half(abar_t))  # unused when last
        h = lam_t - lam_s
        # exp(-h) = (alpha_s * sigma_t) / (sigma_s * alpha_t): -> 0 on the
        # final hop (sigma_t = 0), so expm1(-h) -> -1 without evaluating the
        # infinite lambda.
        exp_neg_h = jnp.where(
            last, 0.0, jnp.sqrt(abar_s) * sigma_t / (sigma_s * alpha_t)
        )

        # second-order multistep extrapolation; first step and the final hop
        # fall back to first order (D = x0_s)
        h_prev = lam_s - lam_prev
        r = h_prev / jnp.where(last, 1.0, h)  # h != 0 off the final hop
        coef = 1.0 / (2.0 * r)
        use_first_order = jnp.logical_or(first, last)
        D = jnp.where(
            use_first_order, x0_s, (1.0 + coef) * x0_s - coef * x0_prev
        )
        x_new = (sigma_t / sigma_s) * x - alpha_t * (exp_neg_h - 1.0) * D
        x_new = jnp.clip(x_new, -1000.0, 1000.0)
        x_new = center_zero(x_new)
        return (x_new, x0_s, lam_s, jnp.asarray(False)), None

    carry0 = (mol, jnp.zeros_like(mol), jnp.asarray(0.0, jnp.float32),
              jnp.asarray(True))
    (mol, _, _, _), _ = jax.lax.scan(step, carry0, (taus, prev_taus))
    return mol


def p_losses(
    buf: DiffusionBuffers,
    score_fn: ScoreFn,
    x_start,
    t,
    key,
    objective: str = "pred_noise",
    loss_type: str = "l2",
):
    """Denoising loss at sampled timesteps (reference models/ddpm.py:288-315)."""
    noise = center_zero(jax.random.normal(key, x_start.shape, dtype=x_start.dtype))
    x = center_zero(q_sample(buf, x_start, t, noise))
    t_norm = t.astype(jnp.float32) / buf.num_timesteps
    model_out = center_zero(score_fn(x, t_norm))
    target = noise if objective == "pred_noise" else x_start
    if loss_type == "l2":
        loss = (model_out - target) ** 2
    elif loss_type == "l1":
        loss = jnp.abs(model_out - target)
    else:
        raise ValueError(f"invalid loss type {loss_type}")
    return loss.mean()


def sample_timesteps(buf: DiffusionBuffers, key, batch: int, t_range=None):
    """t ~ multinomial(loss_weights) — importance sampling of timesteps
    (reference models/ddpm.py:333).

    ``t_range=(lo, hi)`` restricts sampling to the half-open interval
    ``lo <= t < hi`` (so ``(0, 100)`` trains the first 100 noise levels and
    ``(0, T)`` is the full chain). This implements the capability the
    reference intended with ``--t_diff_interval`` but shipped broken: its
    ``forward`` accepts ``t_diff_range`` and never applies it to the
    multinomial (models/ddpm.py:317-333, main_train.py:262-267)."""
    logits = jnp.log(buf.loss_weights)
    if t_range is not None:
        lo, hi = t_range
        t_idx = jnp.arange(buf.num_timesteps)
        logits = jnp.where((t_idx >= lo) & (t_idx < hi), logits, -jnp.inf)
    return jax.random.categorical(key, logits, shape=(batch,))


# ---------------------------------------------------------------------------
# Convenience wrapper
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GaussianDiffusion:
    """Bundles a score model with diffusion buffers and normalization.

    Unlike the reference nn.Module, this object is immutable configuration;
    parameters are passed explicitly so that every method is a pure function
    suitable for jit / grad / shard_map.
    """

    model: "GraphTransformer"  # noqa: F821 — any module with score_forward semantics
    num_atoms: int
    timesteps: int = 1000
    beta_schedule: str = "cosine"
    norm_factor: float = 1.0
    loss_weights: str = "ones"
    objective: str = "pred_noise"
    loss_type: str = "l2"
    # Restrict training-loss timesteps to lo <= t < hi (reference
    # --t_diff_interval, intended but non-functional there — see
    # sample_timesteps). None = full chain.
    t_diff_interval: Optional[tuple] = None
    buffers: DiffusionBuffers = field(init=False)

    def __post_init__(self):
        if self.t_diff_interval is not None:
            lo, hi = self.t_diff_interval
            if not (0 <= lo < hi <= self.timesteps):
                raise ValueError(
                    f"t_diff_interval={self.t_diff_interval} must satisfy "
                    f"0 <= lo < hi <= timesteps={self.timesteps}"
                )
            object.__setattr__(self, "t_diff_interval", (int(lo), int(hi)))
        object.__setattr__(
            self,
            "buffers",
            make_buffers(self.timesteps, self.beta_schedule, self.loss_weights),
        )

    # -- model plumbing ------------------------------------------------------
    def score_fn(self, params, bf16: bool = False) -> ScoreFn:
        """Score closure; ``bf16`` runs the net's compute in bfloat16 (the
        same lever the Langevin force path uses, dynamics/langevin.py). The
        chain state and buffers stay float32, so each sampling step's
        posterior arithmetic promotes back to f32 — only the score-net
        matmuls/activations ride the half-width HBM path."""
        from twoforone_tpu.models.graph_transformer import make_score_fn

        model = self.model.clone(dtype=jnp.bfloat16) if bf16 else self.model
        return make_score_fn(model, params)

    def init_params(self, key):
        x = jnp.zeros((1, self.num_atoms, 3), dtype=jnp.float32)
        t = jnp.zeros((1,), dtype=jnp.float32)
        kwargs = {"return_energy": True} if self.model.conservative else {}
        return self.model.init(key, x, t, **kwargs)["params"]

    # -- training ------------------------------------------------------------
    def loss(self, params, mol, key):
        """Training loss on raw (un-normalized) coordinates.

        Mirrors reference forward (models/ddpm.py:317-337): center + scale,
        sample t from the loss-weight multinomial, and return the KL-at-T
        check value as aux (asserted on host by the trainer).
        """
        mol = center_zero(mol) / self.norm_factor
        b, n, d = mol.shape
        assert n == self.num_atoms and d == 3, f"Molecule shape must be {(self.num_atoms, 3)}"
        t_key, loss_key = jax.random.split(key)
        t = sample_timesteps(self.buffers, t_key, b, self.t_diff_interval)
        kl = normal_kl_at_T(self.buffers, mol)
        loss = p_losses(
            self.buffers,
            self.score_fn(params),
            mol,
            t,
            loss_key,
            self.objective,
            self.loss_type,
        )
        return loss, {"kl_at_T": kl}

    # -- sampling --------------------------------------------------------------
    def _sample_loop_fn(self, sample_steps: Optional[int], eta: float,
                        solver: str = "ddim"):
        """Reverse-chain loop selector: full ancestral chain by default, a
        strided chain when ``sample_steps`` is given (TPU-only extension; the
        reference always runs all T steps). ``solver``: "ddim" (Song et al.
        2020) or "dpm2m" (DPM-Solver++(2M), second-order multistep,
        deterministic — ``eta`` does not apply)."""
        if sample_steps is None:
            return p_sample_loop
        if solver == "ddim":
            return partial(ddim_sample_loop, sample_steps=sample_steps, eta=eta)
        if solver == "dpm2m":
            return partial(dpm_solver_pp_2m_loop, sample_steps=sample_steps)
        raise ValueError(f"unknown solver {solver!r} (ddim | dpm2m)")

    def sample(self, params, batch_size: int, key, mesh=None,
               sample_steps: Optional[int] = None, eta: float = 0.0,
               solver: str = "ddim", bf16: bool = False):
        """Draw i.i.d. samples in data units (reference models/ddpm.py:256-263).

        ``mesh`` shards the batch axis over the mesh devices (the TPU
        equivalent of the reference's DataParallel SamplerWrapper fan-out,
        sample.py:180-186 / utils.py:201-212). ``sample_steps`` switches to
        a strided chain — ``solver="ddim"`` (``eta``: 0 = deterministic,
        1 = ancestral noise scale) or ``solver="dpm2m"``. ``bf16`` runs the
        score net in bfloat16 (chain state stays f32; see ``score_fn``)."""
        shape = (batch_size, self.num_atoms, 3)
        loop = self._sample_loop_fn(sample_steps, eta, solver)
        mol = loop(
            self.buffers, self.score_fn(params, bf16=bf16), shape, key,
            objective=self.objective, mesh=mesh,
        )
        return mol * self.norm_factor

    def make_sample_fn(self, batch_size: int, mesh=None,
                       sample_steps: Optional[int] = None, eta: float = 0.0,
                       solver: str = "ddim", bf16: bool = False):
        """Jitted sampling closure: (params, key) -> (batch, N, 3)."""
        return jax.jit(lambda params, key: self.sample(
            params, batch_size, key, mesh=mesh,
            sample_steps=sample_steps, eta=eta, solver=solver, bf16=bf16,
        ))

    def make_fused_sample_fn(self, params, batch_size: int,
                             block_chains: int = 128, interpret: bool = False,
                             kernel: str = "auto", mesh=None,
                             sample_steps: Optional[int] = None,
                             eta: float = 0.0, solver: str = "ddim"):
        """Jitted sampling closure using a fused Pallas score kernel
        (conservative models only): (key) -> (batch, N, 3).

        Parameters are baked into the kernel at build time (the per-head edge
        matrices are precomputed host-side), so unlike make_sample_fn this
        binds params once — the right trade for inference/serving.

        ``kernel``: "cl" = chain-lane mega-kernel (ops/fused_score_cl.py,
        N <= 10 regime), "clx" = chain-lane attention-core path for larger
        proteins (ops/fused_score_clx.py), "packed" = head-packed
        (ops/fused_score.py), "auto" = the measured-best chain-lane path
        whenever the model config supports one.

        ``mesh``: optional jax.sharding.Mesh — runs the chain per-device via
        shard_map (Pallas kernels are single-device programs; shard_map is
        the idiomatic fan-out). Each device draws its own key stream (the
        batch is i.i.d. either way, unlike the bitwise-stable XLA-path mesh
        sampling in ``sample``). batch_size must divide by the mesh size.
        """
        from twoforone_tpu.ops.fused_score import make_fused_force_kernel, pad_chains

        from twoforone_tpu.ops.fused_score_cl import VERIFIED_MAX_N
        from twoforone_tpu.ops.fused_score_clx import CLX_MAX_N, CLX_MIN_CHAINS

        from twoforone_tpu.parallel.mesh import mesh_size

        m = self.model
        # Same gating as dynamics/langevin.py: the mega-kernel in its
        # verified N <= 10 range; the attention-core clx path in its
        # measured win region (N <= 32, >= 256 chains PER DEVICE — under a
        # mesh each device samples batch/mesh_size); the packed kernel for
        # non-production edge configs; plain XLA (signalled by kernel="xla")
        # where it measured fastest.
        cl_supported = (
            m.conservative and m.use_intrinsic_coords
            and not m.use_abs_coords and not m.use_distances
        )
        if kernel == "auto":
            if cl_supported and m.num_beads <= VERIFIED_MAX_N:
                kernel = "cl"
            elif (
                cl_supported
                and m.num_beads <= CLX_MAX_N
                and batch_size // mesh_size(mesh) >= CLX_MIN_CHAINS
            ):
                kernel = "clx"
            elif cl_supported:
                kernel = "xla"
            else:
                kernel = "packed"
        loop = self._sample_loop_fn(sample_steps, eta, solver)
        if kernel == "xla":
            # Fastest measured option at villin/protein_g scale: the plain
            # geometric XLA path, bound as a fixed-params sample fn.
            sfn = self.score_fn(params)
            shape = (batch_size, self.num_atoms, 3)

            def sample(key):
                mol = loop(self.buffers, sfn, shape, key,
                           objective=self.objective, mesh=mesh)
                return mol * self.norm_factor

            return jax.jit(sample)
        if kernel == "clx":
            from twoforone_tpu.ops.fused_score_clx import make_clx_force_fn

            clx = make_clx_force_fn(m, params, None, interpret=interpret)

            def score_fn(x, t_norm_vec):
                return clx(x, t_norm_vec[0])

        else:
            if kernel == "cl":
                from twoforone_tpu.ops.fused_score_cl import (
                    LANE_B,
                    auto_opts,
                    make_fused_force_kernel_cl,
                )

                kern = make_fused_force_kernel_cl(
                    m, params, None, interpret=interpret,
                    **auto_opts(m.num_beads)
                )
                block_chains = LANE_B
            else:
                kern = make_fused_force_kernel(
                    m, params, None, block_chains=block_chains,
                    interpret=interpret
                )

            def score_fn(x, t_norm_vec):
                xp, b = pad_chains(x, block_chains)
                return kern(xp, t_norm_vec[0])[:b]

        n_dev = mesh_size(mesh)
        if n_dev == 1:
            shape = (batch_size, self.num_atoms, 3)

            def sample(key):
                mol = loop(self.buffers, score_fn, shape, key,
                           objective=self.objective)
                return mol * self.norm_factor

            return jax.jit(sample)

        assert batch_size % n_dev == 0, (
            f"batch {batch_size} must be divisible by mesh size {n_dev}"
        )
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        local_shape = (batch_size // n_dev, self.num_atoms, 3)

        def sample_local(key):
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            mol = loop(self.buffers, score_fn, local_shape, key,
                       objective=self.objective)
            return mol * self.norm_factor

        # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
        # annotation, and the body is per-device-independent by construction.
        fn = jax.shard_map(sample_local, mesh=mesh, in_specs=P(),
                           out_specs=P(axis), check_vma=False)
        return jax.jit(fn)
