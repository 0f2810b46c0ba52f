"""Unit algebra of the diffusion->force-field conversion (the physics contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.data.molecules import KB
from twoforone_tpu.dynamics.langevin import LangevinDiffusion, make_diffusion_force_fn
from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward


def _gd(norm_factor=3.11, conservative=True):
    model = GraphTransformer(
        num_beads=5, hidden_nf=16, n_layers=1,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=conservative,
    )
    gd = GaussianDiffusion(
        model=model, num_atoms=5, timesteps=1000,
        norm_factor=norm_factor, loss_weights="ones",
    )
    params = gd.init_params(jax.random.PRNGKey(0))
    return gd, params


def test_kb_constant():
    # Boltzmann constant in g/mol, Angstrom, ps, K (reference dynamics/langevin.py:9)
    assert KB == pytest.approx(0.83144626181)


def test_force_conversion_formula():
    """forces == -eps_hat / kbt_inv / sqrt(1 - alpha_bar_t)
    (reference dynamics/langevin.py:78-87)."""
    gd, params = _gd()
    t = 20
    kbt_inv = 1.7
    force_fn = make_diffusion_force_fn(gd, params, t, kbt_inv)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3))
    x = x - x.mean(axis=1, keepdims=True)
    _, forces = force_fn(x)
    eps_hat = score_forward(gd.model, params, x, jnp.full((4,), t / 1000.0))
    expected = -np.asarray(eps_hat) / kbt_inv / float(
        gd.buffers.sqrt_one_minus_alphas_cumprod[t]
    )
    np.testing.assert_allclose(np.asarray(forces), expected, rtol=1e-5)


def test_driver_unit_algebra():
    """kb_inv, beta and auto-dt plumbing (reference dynamics/langevin.py:131-168)."""
    gd, params = _gd(norm_factor=2.5)
    init = np.random.default_rng(0).normal(size=(3, 5, 3)).astype(np.float32)
    t = 8
    ld = LangevinDiffusion(
        gd, params, init, n_timesteps=20, save_interval=10, t=t,
        temp_data=300, temp_sim=340, dt=None, masses=[12.8] * 5,
        friction=1.0, kb="consistent", log=False,
    )
    kb_inv = 1.0 / KB * 2.5**2
    assert ld.kb_inv == pytest.approx(kb_inv)
    assert ld.sim.beta == pytest.approx(kb_inv / 340)
    one_minus = 1.0 - float(gd.buffers.alphas_cumprod[t])
    expected_dt = one_minus * 1.0 * 12.8 * kb_inv / 300
    assert ld.sim.dt == pytest.approx(expected_dt, rel=1e-6)
    # initial coordinates divided by norm factor
    np.testing.assert_allclose(
        ld.sim._initial_x, init / 2.5, rtol=1e-6
    )


def test_driver_kcal_units():
    from twoforone_tpu.data.molecules import AVOGADRO, JPERKCAL, KBOLTZMANN

    gd, params = _gd(norm_factor=2.0)
    init = np.zeros((2, 5, 3), dtype=np.float32)
    ld = LangevinDiffusion(
        gd, params, init, n_timesteps=10, save_interval=10, t=5,
        temp_data=300, temp_sim=300, dt=2e-3, masses=[12.0] * 5,
        friction=1.0, kb="kcal", log=False,
    )
    assert ld.kb_inv == pytest.approx(JPERKCAL / KBOLTZMANN / AVOGADRO * 4.0 / 100)
    with pytest.raises(ValueError, match="Wrong kb"):
        LangevinDiffusion(
            gd, params, init, n_timesteps=10, save_interval=10, t=5,
            kb="nonsense", log=False,
        )


def test_driver_end_to_end_and_rescale():
    """Trajectory comes back in data units: (n_sims * n_saves, N, 3)."""
    gd, params = _gd()
    rng = np.random.default_rng(1)
    init = (rng.normal(size=(4, 5, 3)) * 3).astype(np.float32)
    init -= init.mean(axis=1, keepdims=True)
    ld = LangevinDiffusion(
        gd, params, init, n_timesteps=40, save_interval=10, t=8,
        temp_data=300, temp_sim=300, dt=2e-3, masses=[12.8] * 5,
        friction=1.0, log=False, random_seed=0,
    )
    traj = ld.sample()
    assert traj.shape == (16, 5, 3)
    assert np.all(np.isfinite(traj))
    # overdamped route (friction=None) also works
    ld2 = LangevinDiffusion(
        gd, params, init, n_timesteps=20, save_interval=10, t=8,
        temp_data=300, temp_sim=300, dt=2e-3, masses=[12.8] * 5,
        friction=None, log=False, random_seed=0,
    )
    traj2 = ld2.sample()
    assert traj2.shape == (8, 5, 3)


def test_sample_reference_temp_plumbing():
    """LangevinDiffusion.sample(reference_temp=...) reaches the integrator's
    tempering ramp: reference_beta = kb_inv / reference_temp, and the hot
    start measurably widens the early trajectory vs the untempered run."""
    gd, params = _gd(norm_factor=1.0)
    rng = np.random.default_rng(0)
    init = (rng.normal(size=(8, 5, 3)) * 0.1).astype(np.float32)
    init -= init.mean(axis=1, keepdims=True)
    kwargs = dict(
        n_timesteps=40, save_interval=10, t=8,
        temp_data=300, temp_sim=300, dt=1e-4, masses=[12.8] * 5,
        friction=1.0, kb="consistent", random_seed=3, log=False,
        restraint_k=10.0,
    )
    ld = LangevinDiffusion(gd, params, init, **kwargs)
    traj = ld.sample(reference_temp=3000.0)
    assert traj.shape == (8 * 4, 5, 3)
    assert np.all(np.isfinite(traj))
    ld2 = LangevinDiffusion(gd, params, init, **kwargs)
    traj2 = ld2.sample()
    assert not np.allclose(traj, traj2)  # the ramp changed the dynamics
