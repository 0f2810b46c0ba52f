"""Strided DDIM sampler tests.

The reference always runs the full T=1000 ancestral chain
(models/ddpm.py:234-254); the DDIM chain (core/diffusion.py
ddim_sample_loop, Song et al. 2020 / respacing per Nichol & Dhariwal 2021 —
PAPERS.md) is a TPU-side throughput extension. Validated four ways:

1. exact per-step reduction: with a full ladder and eta=1 the DDIM update
   equals the ancestral p_sample update for ANY state/score (sigma^2 is the
   DDPM posterior variance; the means coincide algebraically);
2. whole-chain reduction on a STABLE chain (analytic Gaussian score — a
   random-init net saturates the +-1000 clamp, where chaotic amplification
   of f32 rounding makes trajectory comparison meaningless);
3. exactly solvable physics: the 50-step deterministic DDIM chain
   reproduces the target covariance like the 1000-step ancestral chain does
   (test_pipeline_physics.py analogue);
4. invariants: ladder construction, zero-CoM output, API/mesh plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from twoforone_tpu.core.diffusion import (
    GaussianDiffusion,
    ddim_sample_loop,
    ddim_step,
    ddim_timestep_ladder,
    dpm_solver_pp_2m_loop,
    p_sample,
    p_sample_loop,
)
from twoforone_tpu.core.schedules import make_buffers
from twoforone_tpu.models.graph_transformer import GraphTransformer

N_BEADS = 5


def _tiny_gd(timesteps=50):
    model = GraphTransformer(
        num_beads=N_BEADS, hidden_nf=8, n_layers=1,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True,
    )
    return GaussianDiffusion(
        model=model, num_atoms=N_BEADS, timesteps=timesteps,
        norm_factor=1.7, loss_weights="ones",
    )


def _projector(n):
    return np.eye(n) - np.ones((n, n)) / n


def _analytic_gaussian_score(buf):
    """Optimal eps for N(0, covn) data (same construction as
    test_pipeline_physics.py) — a stable, contractive reverse chain."""
    p = _projector(N_BEADS)
    cov = p @ np.diag([3.0, 2.0, 1.5, 1.0, 0.5]) @ p
    nf2 = cov.trace() / N_BEADS
    covn = cov / nf2
    evals, evecs = np.linalg.eigh(covn)
    ones_dir = int(np.abs(evecs.T @ (np.ones(N_BEADS) / np.sqrt(N_BEADS))).argmax())
    v = jnp.asarray(evecs)
    T = buf.num_timesteps

    def eps_opt(x, t_norm):
        t = jnp.clip(jnp.round(t_norm * T).astype(int), 0, T - 1)[0]
        a = buf.alphas_cumprod[t]
        lam = a * jnp.asarray(evals) + (1.0 - a)
        inv = jnp.where(jnp.arange(N_BEADS) == ones_dir, 0.0,
                        1.0 / jnp.maximum(lam, 1e-12))
        sinv_x = jnp.einsum("ij,j,kj,bkc->bic", v, inv, v, x)
        return jnp.sqrt(1.0 - a) * sinv_x

    return eps_opt, cov, nf2


def test_ladder_construction():
    taus, prev = ddim_timestep_ladder(1000, 50)
    taus, prev = np.asarray(taus), np.asarray(prev)
    assert taus[0] == 999 and taus[-1] == 0 and prev[-1] == -1
    assert np.all(np.diff(taus) < 0)  # strictly descending, no duplicates
    assert np.array_equal(prev[:-1], taus[1:])
    # full ladder degenerates to every step
    taus_f, prev_f = ddim_timestep_ladder(100, 100)
    assert np.array_equal(np.asarray(taus_f), np.arange(99, -1, -1))
    assert np.asarray(prev_f)[-1] == -1
    # single step: one hop from T-1 straight to x0
    taus_1, prev_1 = ddim_timestep_ladder(100, 1)
    assert list(np.asarray(taus_1)) == [99]
    assert list(np.asarray(prev_1)) == [-1]


def test_per_step_eta1_equals_ancestral():
    """ddim_step(tau, tau-1, eta=1) == p_sample(t=tau) for any state and any
    score output (the noise key convention matches too)."""
    buf = make_buffers(50, "cosine", "ones")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, N_BEADS, 3)).astype(np.float32))
    x = x - x.mean(axis=1, keepdims=True)
    eps_const = jnp.asarray(rng.normal(size=(6, N_BEADS, 3)).astype(np.float32))
    sfn = lambda xx, tn: eps_const
    key = jax.random.PRNGKey(7)
    for tau, tau_prev in ((49, 48), (25, 24), (1, 0), (0, -1)):
        t = jnp.full((6,), tau, dtype=jnp.int32)
        anc = p_sample(buf, sfn, x, t, key)
        # clip_x0=None: p_sample does not clip-denoise, and at tau=T-1 the
        # arbitrary mock eps makes |x0| huge (1/sqrt(abar) ~ 2e4)
        dd = ddim_step(buf, sfn, x, tau, tau_prev, key, eta=1.0, clip_x0=None)
        np.testing.assert_allclose(np.asarray(dd), np.asarray(anc),
                                   rtol=1e-4, atol=1e-4)


def test_full_ladder_eta1_chain_is_ancestral():
    """Whole-chain reduction on the stable analytic-score chain."""
    buf = make_buffers(200, "cosine", "ones")
    eps_opt, _, _ = _analytic_gaussian_score(buf)
    key = jax.random.PRNGKey(3)
    shape = (8, N_BEADS, 3)
    anc = p_sample_loop(buf, eps_opt, shape, key)
    dd = ddim_sample_loop(buf, eps_opt, shape, key, sample_steps=200, eta=1.0)
    np.testing.assert_allclose(np.asarray(dd), np.asarray(anc),
                               rtol=1e-3, atol=1e-3)


def test_strided_ddim_reproduces_gaussian_target():
    """50-step deterministic DDIM with the analytic optimal score matches the
    target covariance (the 1000-step ancestral analogue is
    test_pipeline_physics.py::test_reverse_chain_with_analytic_score)."""
    buf = make_buffers(1000, "cosine", "ones")
    eps_opt, cov, nf2 = _analytic_gaussian_score(buf)
    mol = ddim_sample_loop(
        buf, eps_opt, (2000, N_BEADS, 3), jax.random.PRNGKey(0),
        sample_steps=50, eta=0.0,
    )
    samples = np.asarray(mol) * np.sqrt(nf2)
    s = samples.astype(np.float64)
    cov_hat = np.einsum("bic,bjc->ij", s, s) / (s.shape[0] * 3)
    rel = np.linalg.norm(cov_hat - cov) / np.linalg.norm(cov)
    assert rel < 0.08, f"DDIM covariance mismatch: rel={rel:.3f}"
    np.testing.assert_allclose(samples.mean(axis=1), 0.0, atol=1e-3)


def test_sample_api_with_sample_steps():
    gd = _tiny_gd(timesteps=40)
    params = gd.init_params(jax.random.PRNGKey(0))
    out = gd.sample(params, 4, jax.random.PRNGKey(1), sample_steps=8)
    assert out.shape == (4, N_BEADS, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out).mean(axis=1), 0.0, atol=1e-3)
    # jitted closure variant
    fn = gd.make_sample_fn(4, sample_steps=8, eta=0.5)
    out2 = fn(params, jax.random.PRNGKey(2))
    assert out2.shape == (4, N_BEADS, 3)
    # fused-path plumbing (interpret-mode kernel on CPU)
    fn3 = gd.make_fused_sample_fn(params, 4, interpret=True, kernel="packed",
                                  sample_steps=8)
    out3 = fn3(jax.random.PRNGKey(2))
    assert out3.shape == (4, N_BEADS, 3)
    assert np.all(np.isfinite(np.asarray(out3)))


def _gaussian_cov_rel_err(sample_fn, cov, nf2, n=2000, key=0):
    mol = sample_fn((n, N_BEADS, 3), jax.random.PRNGKey(key))
    s = (np.asarray(mol) * np.sqrt(nf2)).astype(np.float64)
    assert np.all(np.isfinite(s))
    cov_hat = np.einsum("bic,bjc->ij", s, s) / (s.shape[0] * 3)
    return np.linalg.norm(cov_hat - cov) / np.linalg.norm(cov)


def test_dpm2m_reproduces_gaussian_target():
    """20-step DPM-Solver++(2M) with the analytic optimal score matches the
    target covariance, and at 10 steps it is no worse than 10-step DDIM
    (the second-order extrapolation is the whole point of the solver)."""
    buf = make_buffers(1000, "cosine", "ones")
    eps_opt, cov, nf2 = _analytic_gaussian_score(buf)
    rel20 = _gaussian_cov_rel_err(
        lambda sh, k: dpm_solver_pp_2m_loop(buf, eps_opt, sh, k, sample_steps=20),
        cov, nf2,
    )
    assert rel20 < 0.08, f"dpm2m-20 covariance mismatch: rel={rel20:.3f}"
    rel10 = _gaussian_cov_rel_err(
        lambda sh, k: dpm_solver_pp_2m_loop(buf, eps_opt, sh, k, sample_steps=10),
        cov, nf2,
    )
    rel10_ddim = _gaussian_cov_rel_err(
        lambda sh, k: ddim_sample_loop(buf, eps_opt, sh, k, sample_steps=10,
                                       eta=0.0),
        cov, nf2,
    )
    assert rel10 <= rel10_ddim * 1.10, (
        f"dpm2m-10 ({rel10:.3f}) worse than ddim-10 ({rel10_ddim:.3f})"
    )


def test_dpm2m_single_step_equals_ddim():
    """sample_steps=1 is one first-order hop straight to the clipped x0
    estimate for both solvers (identical init-noise and model-eval paths)."""
    buf = make_buffers(100, "cosine", "ones")
    eps_opt, _, _ = _analytic_gaussian_score(buf)
    key = jax.random.PRNGKey(5)
    shape = (6, N_BEADS, 3)
    dd = ddim_sample_loop(buf, eps_opt, shape, key, sample_steps=1, eta=0.0)
    dp = dpm_solver_pp_2m_loop(buf, eps_opt, shape, key, sample_steps=1)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dd),
                               rtol=1e-5, atol=1e-6)


def test_dpm2m_sample_api():
    gd = _tiny_gd(timesteps=40)
    params = gd.init_params(jax.random.PRNGKey(0))
    out = gd.sample(params, 4, jax.random.PRNGKey(1), sample_steps=8,
                    solver="dpm2m")
    assert out.shape == (4, N_BEADS, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out).mean(axis=1), 0.0, atol=1e-3)
    fn = gd.make_sample_fn(4, sample_steps=8, solver="dpm2m")
    out2 = fn(params, jax.random.PRNGKey(2))
    assert out2.shape == (4, N_BEADS, 3)
    fn3 = gd.make_fused_sample_fn(params, 4, interpret=True, kernel="packed",
                                  sample_steps=8, solver="dpm2m")
    out3 = fn3(jax.random.PRNGKey(2))
    assert out3.shape == (4, N_BEADS, 3)
    assert np.all(np.isfinite(np.asarray(out3)))


def test_sharded_dpm2m_sampling():
    """Batch-sharded DPM2M equals the single-device chain."""
    from twoforone_tpu.parallel.mesh import get_mesh

    buf = make_buffers(100, "cosine", "ones")
    eps_opt, _, _ = _analytic_gaussian_score(buf)
    mesh = get_mesh()
    key = jax.random.PRNGKey(1)
    shape = (16, N_BEADS, 3)
    sharded = dpm_solver_pp_2m_loop(buf, eps_opt, shape, key, sample_steps=10,
                                    mesh=mesh)
    assert sharded.sharding.device_set == set(jax.devices())
    single = dpm_solver_pp_2m_loop(buf, eps_opt, shape, key, sample_steps=10)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


def test_sharded_ddim_sampling():
    """Batch-sharded DDIM equals the single-device chain (threefry is
    partitionable and every op is per-sample) on the stable analytic score."""
    from twoforone_tpu.parallel.mesh import chain_sharding, get_mesh

    buf = make_buffers(100, "cosine", "ones")
    eps_opt, _, _ = _analytic_gaussian_score(buf)
    mesh = get_mesh()
    key = jax.random.PRNGKey(1)
    shape = (16, N_BEADS, 3)
    sharded = ddim_sample_loop(buf, eps_opt, shape, key, sample_steps=10,
                               eta=0.0, mesh=mesh)
    assert sharded.sharding.device_set == set(jax.devices())
    single = ddim_sample_loop(buf, eps_opt, shape, key, sample_steps=10, eta=0.0)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
