import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twoforone_tpu.core.diffusion import (
    GaussianDiffusion,
    normal_kl_at_T,
    p_sample_loop,
    predict_start_from_noise,
    q_posterior,
    q_sample,
    sample_timesteps,
)
from twoforone_tpu.core.schedules import make_buffers
from twoforone_tpu.models.graph_transformer import GraphTransformer
from twoforone_tpu.ops.geometry import center_zero


@pytest.fixture(scope="module")
def buf():
    return make_buffers(1000, "cosine", "higheruntil_100")


def test_q_sample_predict_start_roundtrip(buf):
    key = jax.random.PRNGKey(0)
    x0 = center_zero(jax.random.normal(key, (8, 5, 3)))
    noise = center_zero(jax.random.normal(jax.random.PRNGKey(1), x0.shape))
    t = jnp.array([0, 1, 10, 100, 500, 900, 998, 999])
    xt = q_sample(buf, x0, t, noise)
    x0_rec = predict_start_from_noise(buf, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-2)


def test_posterior_interpolates(buf):
    # with x_start == x_t == x, posterior mean = (coef1 + coef2) * x
    x = center_zero(jax.random.normal(jax.random.PRNGKey(2), (4, 5, 3)))
    t = jnp.array([1, 10, 100, 999])
    mean, var, logvar = q_posterior(buf, x, x, t)
    c = np.asarray(buf.posterior_mean_coef1[t] + buf.posterior_mean_coef2[t])
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x) * c[:, None, None], rtol=1e-5)
    assert np.all(np.asarray(var) > 0)


def test_kl_at_T_small_for_normalized_data(buf):
    x0 = center_zero(jax.random.normal(jax.random.PRNGKey(3), (64, 10, 3)))
    kl = float(normal_kl_at_T(buf, x0))
    assert kl < 1e-4  # the reference asserts this every training step


def test_kl_at_T_large_for_unnormalized_data(buf):
    x0 = center_zero(jax.random.normal(jax.random.PRNGKey(4), (64, 10, 3))) * 50.0
    assert float(normal_kl_at_T(buf, x0)) > 1e-4


def test_sample_timesteps_distribution(buf):
    t = sample_timesteps(buf, jax.random.PRNGKey(5), 20000)
    t = np.asarray(t)
    assert t.min() >= 0 and t.max() < 1000
    # higheruntil_100: half the mass below t=100
    frac_low = (t < 100).mean()
    assert 0.45 < frac_low < 0.55


def test_sample_timesteps_t_range_confines(buf):
    """t_diff_interval restricts the multinomial to lo <= t < hi — the
    capability the reference intended but shipped as a no-op
    (models/ddpm.py:317-333 ignores t_diff_range)."""
    t = np.asarray(sample_timesteps(buf, jax.random.PRNGKey(6), 20000,
                                    t_range=(0, 100)))
    assert t.min() >= 0 and t.max() < 100
    t = np.asarray(sample_timesteps(buf, jax.random.PRNGKey(7), 20000,
                                    t_range=(250, 700)))
    assert t.min() >= 250 and t.max() < 700
    # relative weights inside the window are preserved (higheruntil_100 is
    # uniform within [250, 700)): roughly uniform occupancy
    hist = np.bincount(t - 250, minlength=450)
    assert hist.min() > 0


def test_t_diff_interval_validation_and_loss():
    gd_bad = lambda iv: GaussianDiffusion(
        model=GraphTransformer(num_beads=5, hidden_nf=8, n_layers=1,
                               use_intrinsic_coords=True,
                               use_abs_coords=False, use_distances=False),
        num_atoms=5, timesteps=8, t_diff_interval=iv,
    )
    with pytest.raises(ValueError):
        gd_bad((5, 5))
    with pytest.raises(ValueError):
        gd_bad((0, 9))
    gd = gd_bad((0, 4))
    params = gd.init_params(jax.random.PRNGKey(0))
    mol = center_zero(jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3)))
    loss, aux = jax.jit(gd.loss)(params, mol, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def _tiny_diffusion(timesteps=8, conservative=False):
    model = GraphTransformer(
        num_beads=5,
        hidden_nf=16,
        n_layers=1,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        conservative=conservative,
    )
    return GaussianDiffusion(
        model=model,
        num_atoms=5,
        timesteps=timesteps,
        norm_factor=2.0,
        loss_weights="ones",
    )


def test_sampling_loop_end_to_end():
    gd = _tiny_diffusion()
    params = gd.init_params(jax.random.PRNGKey(0))
    samples = gd.sample(params, 6, jax.random.PRNGKey(1))
    samples = np.asarray(samples)
    assert samples.shape == (6, 5, 3)
    assert np.all(np.isfinite(samples))
    # samples are centered (scaled by norm_factor preserves zero-CoM)
    np.testing.assert_allclose(samples.mean(axis=1), 0.0, atol=1e-4)


def test_sampling_loop_conservative():
    gd = _tiny_diffusion(conservative=True)
    params = gd.init_params(jax.random.PRNGKey(0))
    fn = gd.make_sample_fn(4)
    samples = np.asarray(fn(params, jax.random.PRNGKey(2)))
    assert samples.shape == (4, 5, 3)
    assert np.all(np.isfinite(samples))


def test_loss_and_grads():
    # T=1000 so the KL-at-T check passes (with T=8 it correctly fails,
    # which is exactly what the reference's assert guards against).
    gd = _tiny_diffusion(timesteps=1000, conservative=True)
    params = gd.init_params(jax.random.PRNGKey(0))
    mol = jax.random.normal(jax.random.PRNGKey(3), (16, 5, 3)) * 2.0

    @jax.jit
    def loss_fn(p, key):
        return gd.loss(p, mol, key)

    (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(aux["kl_at_T"]) < 1e-4
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))


def test_bf16_sampling_matches_f32_distribution():
    """bf16 score-net compute in the reverse chain (sample(bf16=True)) must
    leave the sampled distribution unchanged — same contract the Langevin
    force path's bf16 flag carries (dynamics/langevin.py). Checked on a
    randomly-initialized conservative net: whatever distribution the f32
    chain produces, the bf16 chain must produce the same bead covariance."""
    gd = _tiny_diffusion(timesteps=100, conservative=True)
    params = gd.init_params(jax.random.PRNGKey(0))
    n = 4096
    s32 = np.asarray(gd.sample(params, n, jax.random.PRNGKey(11)))
    s16 = np.asarray(gd.sample(params, n, jax.random.PRNGKey(11), bf16=True))
    assert np.all(np.isfinite(s16))
    np.testing.assert_allclose(s16.mean(axis=1), 0.0, atol=1e-3)

    def bead_cov(s):
        s = s.astype(np.float64)
        return np.einsum("bic,bjc->ij", s, s) / (s.shape[0] * 3)

    c32, c16 = bead_cov(s32), bead_cov(s16)
    rel = np.linalg.norm(c16 - c32) / np.linalg.norm(c32)
    # same-key trajectories diverge microscopically (eps-hat rounding), so
    # the comparison is distributional; 4096 samples put the sampling noise
    # on bead-cov around 2-3% — bf16 must sit inside that band.
    assert rel < 0.05, f"bf16 vs f32 bead-cov rel diff {rel:.4f}"


def test_p_sample_loop_reproducible():
    gd = _tiny_diffusion()
    params = gd.init_params(jax.random.PRNGKey(0))
    s1 = gd.sample(params, 3, jax.random.PRNGKey(7))
    s2 = gd.sample(params, 3, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
