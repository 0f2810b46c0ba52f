import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twoforone_tpu.models.graph_transformer import (
    GraphTransformer,
    score_forward,
)
from twoforone_tpu.ops.attention import (
    edge_biased_attention,
    edge_biased_attention_naive,
)
from twoforone_tpu.ops.geometry import center_zero, random_rotation


def _make_model(conservative=True, **kw):
    defaults = dict(
        num_beads=10,
        hidden_nf=32,
        n_layers=2,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        conservative=conservative,
    )
    defaults.update(kw)
    return GraphTransformer(**defaults)


def _init(model, key=0):
    x = jnp.zeros((1, model.num_beads, 3))
    t = jnp.zeros((1,))
    kwargs = {"return_energy": True} if model.conservative else {}
    return model.init(jax.random.PRNGKey(key), x, t, **kwargs)["params"]


@pytest.mark.parametrize(
    "intrinsic,distances",
    [
        (True, False),  # production (all shipped configs use intrinsic-only)
        pytest.param(False, True, marks=pytest.mark.slow),
        pytest.param(True, True, marks=pytest.mark.slow),
        pytest.param(False, False, marks=pytest.mark.slow),
    ],
)
def test_geometric_edges_match_general_path(intrinsic, distances):
    """The production geometric-edge factorization must be an exact algebraic
    identity with the explicit N^2 edge-tensor computation."""
    kwargs = dict(
        num_beads=9,
        hidden_nf=32,
        n_layers=2,
        use_intrinsic_coords=intrinsic,
        use_abs_coords=False,
        use_distances=distances,
        conservative=True,
    )
    geo = GraphTransformer(use_geometric_edges=True, **kwargs)
    gen = GraphTransformer(use_geometric_edges=False, **kwargs)
    x0 = jnp.zeros((1, 9, 3))
    t0 = jnp.zeros((1,))
    params = geo.init(jax.random.PRNGKey(0), x0, t0, return_energy=True)["params"]
    # same param tree in both modes
    params_gen = gen.init(jax.random.PRNGKey(0), x0, t0, return_energy=True)["params"]
    jax.tree_util.tree_map(lambda a, b: None, params, params_gen)

    x = center_zero(jax.random.normal(jax.random.PRNGKey(1), (4, 9, 3)) * 3)
    t = jnp.full((4,), 0.4)
    e_geo = score_forward(geo, params, x, t, return_energy=True)
    e_gen = score_forward(gen, params, x, t, return_energy=True)
    np.testing.assert_allclose(np.asarray(e_geo), np.asarray(e_gen), atol=1e-4, rtol=1e-4)
    f_geo = score_forward(geo, params, x, t)
    f_gen = score_forward(gen, params, x, t)
    np.testing.assert_allclose(np.asarray(f_geo), np.asarray(f_gen), atol=1e-4, rtol=1e-4)


def test_attention_factored_matches_naive():
    key = jax.random.PRNGKey(0)
    B, N, H, dh, De = 3, 7, 4, 8, 5
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, N, H, dh))
    k = jax.random.normal(ks[1], (B, N, H, dh))
    v = jax.random.normal(ks[2], (B, N, H, dh))
    edges = jax.random.normal(ks[3], (B, N, N, De))
    w_e = jax.random.normal(ks[4], (De, H, dh)) * 0.3
    b_e = jax.random.normal(ks[5], (H, dh)) * 0.1
    scale = dh**-0.5
    out_fast = edge_biased_attention(q, k, v, edges, w_e, b_e, scale)
    out_naive = edge_biased_attention_naive(q, k, v, edges, w_e, b_e, scale)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_naive), atol=1e-5)


@pytest.mark.parametrize(
    "intrinsic,abs_coords,distances",
    [(True, False, False), (False, True, True), (True, False, True), (False, False, True)],
)
def test_forward_shapes(intrinsic, abs_coords, distances):
    model = _make_model(
        conservative=False,
        use_intrinsic_coords=intrinsic,
        use_abs_coords=abs_coords,
        use_distances=distances,
    )
    params = _init(model)
    x = center_zero(jax.random.normal(jax.random.PRNGKey(1), (4, 10, 3)))
    t = jnp.full((4,), 0.5)
    out = score_forward(model, params, x, t)
    assert out.shape == (4, 10, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_energy_shape_and_forces():
    model = _make_model(conservative=True)
    params = _init(model)
    x = center_zero(jax.random.normal(jax.random.PRNGKey(2), (4, 10, 3)))
    t = jnp.full((4,), 0.3)
    energy = score_forward(model, params, x, t, return_energy=True)
    assert energy.shape == (4, 10, 1)
    forces = score_forward(model, params, x, t)
    assert forces.shape == (4, 10, 3)
    # translation-invariant energy (intrinsic coords) -> forces sum to ~0
    np.testing.assert_allclose(np.asarray(forces.sum(axis=1)), 0.0, atol=1e-4)


def test_conservative_forces_are_gradient_field():
    """The Jacobian of a gradient field is symmetric (curl-free check)."""
    model = _make_model(conservative=True, num_beads=4, hidden_nf=16, n_layers=1)
    params = _init(model)
    t = jnp.full((1,), 0.5)

    def f(flat):
        x = flat.reshape(1, 4, 3)
        return score_forward(model, params, x, t).reshape(-1)

    x0 = center_zero(jax.random.normal(jax.random.PRNGKey(3), (1, 4, 3))).reshape(-1)
    jac = jax.jacfwd(f)(x0)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac).T, atol=1e-4)


def test_translation_invariance_via_centering():
    model = _make_model(conservative=False)
    params = _init(model)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 3))
    t = jnp.full((2,), 0.1)
    out1 = score_forward(model, params, x, t)
    out2 = score_forward(model, params, x + 7.5, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_rotation_equivariance_intrinsic_energy():
    """With intrinsic-coord edges only, energies depend on x only through
    coordinate differences; a *global* rotation changes diffs, so energies are
    not rotation invariant — but permuting nothing and rotating by identity is.
    Instead verify the documented E(3) behavior: translation invariance of the
    energy and exact zero-sum forces."""
    model = _make_model(conservative=True)
    params = _init(model)
    x = center_zero(jax.random.normal(jax.random.PRNGKey(5), (3, 10, 3)))
    t = jnp.full((3,), 0.2)
    e1 = score_forward(model, params, x, t, return_energy=True)
    e2 = score_forward(model, params, x + 3.0, t, return_energy=True)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-4)


def test_jit_and_grad_compose():
    model = _make_model(conservative=True)
    params = _init(model)
    x = center_zero(jax.random.normal(jax.random.PRNGKey(6), (2, 10, 3)))
    t = jnp.full((2,), 0.5)

    @jax.jit
    def loss(p):
        out = score_forward(model, p, x, t)
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.parametrize(
    "has_diff,has_dist",
    [(True, False), (False, True), (True, True), (False, False)],
)
def test_geometric_packed_matches_unpacked(has_diff, has_dist):
    """The packed one-matmul-per-side formulation (production, large-N
    lever) must match the unpacked geometric factorization in value AND
    gradient — the dropped sim terms are row constants that cancel in the
    softmax."""
    from twoforone_tpu.ops.attention import (
        geometric_edge_attention,
        geometric_edge_attention_packed,
    )

    key = jax.random.PRNGKey(3)
    B, N, H, dh = 3, 9, 4, 8
    ks = jax.random.split(key, 7)
    q = jax.random.normal(ks[0], (B, N, H, dh))
    k = jax.random.normal(ks[1], (B, N, H, dh))
    v = jax.random.normal(ks[2], (B, N, H, dh))
    x = center_zero(jax.random.normal(ks[3], (B, N, 3)) * 2.0)
    k_diff = jax.random.normal(ks[4], (3, H, dh)) * 0.3 if has_diff else None
    k_dist = jax.random.normal(ks[5], (H, dh)) * 0.1 if has_dist else None
    b_comb = jax.random.normal(ks[6], (H, dh)) * 0.1
    scale = dh**-0.5

    ref = geometric_edge_attention(q, k, v, x, k_diff, k_dist, b_comb, scale)
    new = geometric_edge_attention_packed(q, k, v, x, k_diff, k_dist, b_comb, scale)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref), atol=1e-5)

    def loss_ref(q, x):
        return geometric_edge_attention(q, k, v, x, k_diff, k_dist, b_comb, scale).sum()

    def loss_new(q, x):
        return geometric_edge_attention_packed(q, k, v, x, k_diff, k_dist, b_comb, scale).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(q, x)
    g_new = jax.grad(loss_new, argnums=(0, 1))(q, x)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
