import numpy as np
import pytest

from twoforone_tpu.core.schedules import (
    cosine_beta_schedule,
    linear_beta_schedule,
    make_buffers,
    make_loss_weights,
)


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(1000)
    assert betas.dtype == np.float64
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_cosine_schedule_values():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)
    # Closed-form check at t=0: beta_0 = 1 - acp(1)/acp(0) with the
    # Nichol-Dhariwal f(t) = cos^2(((t/T + s)/(1+s)) * pi/2) normalized by f(0).
    import math

    s = 0.008
    f = lambda t: math.cos(((t / 1000 + s) / (1 + s)) * math.pi / 2) ** 2
    beta0 = 1 - f(1) / f(0)
    assert betas[0] == pytest.approx(beta0, rel=1e-12)
    # Last betas should hit the 0.999 clip for T=1000.
    assert betas[-1] == pytest.approx(0.999)


def test_buffers_consistency():
    buf = make_buffers(100, "cosine", "ones")
    ac = np.asarray(buf.alphas_cumprod, dtype=np.float64)
    betas = np.asarray(buf.betas, dtype=np.float64)
    # alphas_cumprod is the cumulative product of (1 - beta) (float32 tolerance)
    np.testing.assert_allclose(ac, np.cumprod(1 - betas), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(buf.sqrt_alphas_cumprod) ** 2, ac, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(buf.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac, rtol=1e-4
    )
    # posterior mean coefficients sum to 1 when x_start == x_t == x
    # coef1 + coef2 = (beta*sqrt(acp_prev) + (1-acp_prev)*sqrt(alpha)) / (1-acp)
    prev = np.asarray(buf.alphas_cumprod_prev, dtype=np.float64)
    c1 = betas * np.sqrt(prev) / (1 - ac)
    c2 = (1 - prev) * np.sqrt(1 - betas) / (1 - ac)
    np.testing.assert_allclose(np.asarray(buf.posterior_mean_coef1), c1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(buf.posterior_mean_coef2), c2, rtol=1e-4)


def test_loss_weight_schemes():
    betas = cosine_beta_schedule(1000)
    ones = make_loss_weights("ones", betas)
    assert np.all(ones == 1.0)

    sm = make_loss_weights("score_matching", betas)
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(sm, 1 / (1 - ac))

    hu = make_loss_weights("higheruntil_100", betas)
    assert hu[0] == pytest.approx(10.0)
    assert hu[100] == pytest.approx(1000 / 900)
    # equal total mass in the two regions
    assert hu[:100].sum() == pytest.approx(hu[100:].sum())

    lb = make_loss_weights("lower_bound_1000", betas)
    assert lb.mean() == pytest.approx(1.0)
    assert np.all(lb >= 0)

    with pytest.raises(ValueError):
        make_loss_weights("nonsense", betas)
