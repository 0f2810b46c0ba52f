"""Fused Pallas score kernel vs the standard XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward
from twoforone_tpu.ops.fused_score import (
    _erf,
    make_fused_force_kernel,
    pad_chains,
)


def _setup(intrinsic=True, distances=False, n_beads=10, hidden=32, layers=2):
    model = GraphTransformer(
        num_beads=n_beads, hidden_nf=hidden, n_layers=layers,
        use_intrinsic_coords=intrinsic, use_abs_coords=False,
        use_distances=distances, conservative=True,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n_beads, 3)), jnp.zeros((1,)),
        return_energy=True,
    )["params"]
    return model, params


def test_erf_approximation():
    x = jnp.linspace(-4, 4, 201)
    import scipy.special as sp

    np.testing.assert_allclose(np.asarray(_erf(x)), sp.erf(np.asarray(x)), atol=5e-7)
    # exact custom derivative
    g = jax.vmap(jax.grad(_erf))(x)
    expected = 2 / np.sqrt(np.pi) * np.exp(-np.asarray(x) ** 2)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


# Fast lane keeps the production configuration (intrinsic edges, packed —
# the chignolin shipped config); the remaining interpret-mode combinations
# are compile-heavy on CPU and run in the slow lane.
@pytest.mark.parametrize(
    "packed", [True, pytest.param(False, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize(
    "intrinsic,distances",
    [
        (True, False),
        pytest.param(True, True, marks=pytest.mark.slow),
        pytest.param(False, True, marks=pytest.mark.slow),
    ],
)
def test_fused_kernel_matches_xla(intrinsic, distances, packed):
    model, params = _setup(intrinsic=intrinsic, distances=distances)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 10, 3)) * 2.0
    x = x - x.mean(axis=1, keepdims=True)
    t = jnp.full((8,), 0.02)
    ref = score_forward(model, params, x, t)
    fused = make_fused_force_kernel(model, params, 0.02, block_chains=4,
                                    interpret=True, packed=packed)
    out = fused(x)
    # both paths are ~1e-4 from the float64 ground truth (forces scale ~35);
    # the comparison bound is mutual float32 noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-2)


def test_fused_kernel_in_langevin_force_fn():
    """The fused force field must equal the XLA ForcesWrapper conversion."""
    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.dynamics.langevin import make_diffusion_force_fn

    model, params = _setup()
    gd = GaussianDiffusion(model=model, num_atoms=10, timesteps=1000,
                           norm_factor=3.11, loss_weights="ones")
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 10, 3))
    x = x - x.mean(axis=1, keepdims=True)
    f_xla = make_diffusion_force_fn(gd, params, 20, kbt_inv=2.0, fused="never")
    # interpret-mode fused kernel on CPU via monkeypatched block size
    from twoforone_tpu.ops import fused_score

    kernel = fused_score.make_fused_force_kernel(model, params, 20 / 1000,
                                                 block_chains=2, interpret=True)
    scale = 1.0 / (2.0 * float(gd.buffers.sqrt_one_minus_alphas_cumprod[20]))
    forces_fused = -kernel(x) * scale
    _, forces_ref = f_xla(x)
    np.testing.assert_allclose(
        np.asarray(forces_fused), np.asarray(forces_ref), atol=5e-3, rtol=1e-2
    )


def test_pad_chains():
    x = jnp.ones((10, 5, 3))
    padded, n = pad_chains(x, 8)
    assert padded.shape == (16, 5, 3) and n == 10
    padded2, n2 = pad_chains(x, 5)
    assert padded2.shape == (10, 5, 3) and n2 == 10


@pytest.mark.parametrize(
    "kernel", ["packed", pytest.param("cl", marks=pytest.mark.slow),
               pytest.param("clx", marks=pytest.mark.slow)]
)
def test_fused_sampling_matches_standard(kernel):
    """Reverse-chain sampling through the runtime-t fused kernels must match
    the standard path (same keys, tiny T)."""
    from twoforone_tpu.core.diffusion import GaussianDiffusion

    model, params = _setup(hidden=16, layers=1)
    gd = GaussianDiffusion(model=model, num_atoms=10, timesteps=8,
                           norm_factor=2.0, loss_weights="ones")
    key = jax.random.PRNGKey(0)
    ref = gd.sample(params, 4, key)
    fused_fn = gd.make_fused_sample_fn(
        params, 4, block_chains=4, interpret=True, kernel=kernel
    )
    out = fused_fn(key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


@pytest.mark.slow  # ~50 s interpret-mode sweep over 4 kernel variants; the
# production variant stays covered in the fast lane by
# test_fused_kernel_in_langevin_force_fn + test_fused_sampling_matches_standard.
def test_chain_lane_kernel_matches_xla():
    """The chain-lane fused kernel (ops/fused_score_cl.py) must match the
    XLA score path on the production edge config, for fixed and runtime t,
    with and without in-kernel remat."""
    from twoforone_tpu.ops.fused_score_cl import make_fused_force_kernel_cl

    model, params = _setup(intrinsic=True, distances=False, hidden=24, layers=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (128, 10, 3)) * 2.0
    x = x - x.mean(axis=1, keepdims=True)
    t = jnp.full((128,), 0.02)
    ref = score_forward(model, params, x, t)
    for remat in (True, False):
        kern = make_fused_force_kernel_cl(
            model, params, 0.02, interpret=True, remat=remat
        )
        np.testing.assert_allclose(
            np.asarray(kern(x)), np.asarray(ref), atol=5e-3, rtol=1e-2
        )
    # loop-over-i attention formulation (large-N VMEM shape) is exact too
    kern_li = make_fused_force_kernel_cl(
        model, params, 0.02, interpret=True, loop_i=True
    )
    np.testing.assert_allclose(
        np.asarray(kern_li(x)), np.asarray(ref), atol=5e-3, rtol=1e-2
    )
    kern_rt = make_fused_force_kernel_cl(model, params, None, interpret=True)
    np.testing.assert_allclose(
        np.asarray(kern_rt(x, 0.02)), np.asarray(ref), atol=5e-3, rtol=1e-2
    )


@pytest.mark.slow  # ~40-70 s each on the 1-core CI host; the hierarchical
# remat variants are a measured dead end kept for the record (PERF_NOTES
# round 3), not a production path — slow lane is the right cost tier.
@pytest.mark.parametrize("scope", ["layer", "head", "row"])
def test_chain_lane_hierarchical_remat_matches_xla(scope):
    """The large-N kernel configuration — loop-over-i attention with
    hierarchical (layer/head/row) manual remat — must stay exact at a
    trp_cage-scale bead count (N=20). The remat scopes change only WHEN
    slabs are recomputed in the in-kernel backward, never the math."""
    from twoforone_tpu.ops.fused_score_cl import make_fused_force_kernel_cl

    model, params = _setup(
        intrinsic=True, distances=False, n_beads=20, hidden=16, layers=1
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (128, 20, 3)) * 3.0
    x = x - x.mean(axis=1, keepdims=True)
    t = jnp.full((128,), 0.015)
    ref = score_forward(model, params, x, t)
    kern = make_fused_force_kernel_cl(
        model, params, 0.015, interpret=True, remat=scope, loop_i=True
    )
    np.testing.assert_allclose(
        np.asarray(kern(x)), np.asarray(ref), atol=5e-3, rtol=1e-2
    )


def test_cl_attention_core_fwd_and_hand_vjp():
    """The chain-lane attention core kernel (fori_loop rows, hand-written
    VJP) must match the pure-jnp oracle in value AND in every gradient."""
    from twoforone_tpu.ops.attention_cl_core import (
        cl_attention_reference,
        make_cl_attention_core,
    )

    H, dh, N, B = 3, 8, 20, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q = jax.random.normal(ks[0], (H, dh, N, B))
    k = jax.random.normal(ks[1], (H, dh, N, B))
    v = jax.random.normal(ks[2], (H, dh, N, B))
    x = jax.random.normal(ks[3], (3, N, B)) * 2
    qb = jax.random.normal(ks[4], (H, N, B))
    qkd = jax.random.normal(ks[5], (H, 3, N, B)) * 0.3

    core = make_cl_attention_core(H, dh, N, interpret=True)
    out, fd = core(q, k, v, x, qb, qkd)
    out_r, fd_r = cl_attention_reference(q, k, v, x, qb, qkd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_r), atol=1e-5)

    def loss(f):
        def inner(*a):
            o, fdif = f(*a)
            return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(fdif) * 0.7)

        return inner

    g1 = jax.grad(loss(core), argnums=tuple(range(6)))(q, k, v, x, qb, qkd)
    g2 = jax.grad(loss(cl_attention_reference), argnums=tuple(range(6)))(
        q, k, v, x, qb, qkd
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("n_beads", [10, pytest.param(20, marks=pytest.mark.slow)])
def test_clx_force_fn_matches_xla(n_beads):
    """The large-N clx path (XLA chain-lane layout + Pallas attention core)
    must match score_forward for fixed and runtime t, including non-128
    batch padding."""
    from twoforone_tpu.ops.fused_score_clx import make_clx_force_fn

    model, params = _setup(
        intrinsic=True, distances=False, n_beads=n_beads, hidden=16, layers=2
    )
    x = jax.random.normal(jax.random.PRNGKey(7), (130, n_beads, 3)) * 2.0
    x = x - x.mean(axis=1, keepdims=True)
    t = jnp.full((130,), 0.02)
    ref = score_forward(model, params, x, t)
    fn = make_clx_force_fn(model, params, 0.02, interpret=True)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref), atol=5e-4,
                               rtol=1e-3)
    fn_rt = make_clx_force_fn(model, params, None, interpret=True)
    np.testing.assert_allclose(np.asarray(fn_rt(x, 0.02)), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_auto_opts_ranges():
    from twoforone_tpu.ops.fused_score_cl import auto_opts

    assert auto_opts(5) == {"remat": "energy", "loop_i": False}
    assert auto_opts(10)["remat"] == "energy"
    for n in (20, 28, 33, 56):
        o = auto_opts(n)
        assert o["remat"] == "row" and o["loop_i"]


def test_fused_auto_mode_selection(monkeypatch):
    """make_diffusion_force_fn's auto gate: cl mega-kernel at N<=10,
    clx from the measured chain-count crossover, plain XLA otherwise.
    (Resolution logic only — numerics are covered by the parity tests.)"""
    import twoforone_tpu.dynamics.langevin as lv
    from twoforone_tpu.core.diffusion import GaussianDiffusion

    calls = []
    monkeypatch.setattr(
        "twoforone_tpu.ops.fused_score_cl.make_fused_force_kernel_cl",
        lambda *a, **k: calls.append("cl") or (lambda x: x),
    )
    monkeypatch.setattr(
        "twoforone_tpu.ops.fused_score_clx.make_clx_force_fn",
        lambda *a, **k: calls.append("clx") or (lambda x: x),
    )
    monkeypatch.setattr(
        "jax.default_backend", lambda: "tpu"
    )

    def gate(n_beads, n_chains):
        calls.clear()
        model, params = _setup(n_beads=n_beads, hidden=16, layers=1)
        gd = GaussianDiffusion(model=model, num_atoms=n_beads, timesteps=100,
                               norm_factor=1.0, loss_weights="ones")
        lv.make_diffusion_force_fn(gd, params, 20, kbt_inv=1.0, fused="auto",
                                   n_chains=n_chains)
        return calls[0] if calls else "xla"

    assert gate(10, 100) == "cl"
    assert gate(20, 1024) == "clx"
    assert gate(20, 100) == "xla"  # below the measured clx chain crossover
    assert gate(20, None) == "xla"
    assert gate(56, 1024) == "xla"  # above CLX_MAX_N: XLA measured fastest
