"""Diffusion schedules and derived buffers.

Pure-numpy construction in float64 (parity with the reference, which builds
schedules in torch.float64 and registers float32 buffers — see reference
utils.py:42-62 and models/ddpm.py:45-138), then frozen into float32 jnp arrays
bundled in an immutable :class:`DiffusionBuffers` pytree so every diffusion
function stays stateless and jit-friendly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear beta schedule (reference utils.py:42-49), float64."""
    scale = 1000.0 / timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol–Dhariwal cosine schedule (reference utils.py:52-62), float64."""
    steps = timesteps + 1
    x = np.linspace(0.0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1.0 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


class DiffusionBuffers(NamedTuple):
    """All per-timestep coefficients used by forward/reverse diffusion.

    Mirrors the registered buffers of the reference GaussianDiffusion
    (models/ddpm.py:67-99). Shapes are all ``(T,)`` float32.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weights: jnp.ndarray  # timestep-sampling weights ("p2_loss_weight")

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_loss_weights(name: str, betas: np.ndarray) -> np.ndarray:
    """Timestep-importance weights; reference models/ddpm.py:100-138.

    The reference *samples* training timesteps from a multinomial over these
    weights rather than reweighting the loss (models/ddpm.py:333).

    - ``ones``: p2 reweighting with gamma=0 — uniform.
    - ``score_matching``: unnormalized ``1/(1 - alpha_bar_t)``.
    - ``higheruntil_K``: two-level piecewise, total mass split evenly between
      ``[0, K)`` and ``[K, T)`` (all shipped models use ``higheruntil_100``).
    - ``lower_bound_K``: ``1/((1-alpha_bar)(1-beta))`` clipped to ``[0, K]``,
      normalized to mean 1.
    """
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    T = len(alphas_cumprod)
    if name == "ones":
        # (k + ac/(1-ac)) ** -gamma with gamma=0 == ones
        w = np.ones(T, dtype=np.float64)
    elif name == "score_matching":
        w = 1.0 / (1.0 - alphas_cumprod)
    elif name.startswith("higheruntil_"):
        threshold = int(name.split("_")[1])
        w1 = T / threshold
        w2 = T / (T - threshold)
        w = np.array([w1] * threshold + [w2] * (T - threshold), dtype=np.float64)
    elif name.startswith("lower_bound"):
        clamp_val = int(name.split("_")[2])
        unnormalized = np.clip(1.0 / ((1.0 - alphas_cumprod) * (1.0 - betas)), 0, clamp_val)
        w = unnormalized / unnormalized.sum() * T
    else:
        raise ValueError(f"Wrong loss_weights: {name}")
    return w


def make_buffers(
    timesteps: int = 1000,
    beta_schedule: str = "cosine",
    loss_weights: str = "ones",
) -> DiffusionBuffers:
    """Build all diffusion buffers in float64 and freeze to float32 jnp arrays."""
    if beta_schedule == "linear":
        betas = linear_beta_schedule(timesteps)
    elif beta_schedule == "cosine":
        betas = cosine_beta_schedule(timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionBuffers(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        loss_weights=f32(make_loss_weights(loss_weights, betas)),
    )


def extract(buf: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape for (B, N, 3) broadcasting.

    Equivalent of reference utils.py:33-39 ``extract``.
    """
    return buf[t][:, None, None]
