"""Numerical parity between this framework's score net and the reference
semantics, via the torch-checkpoint converter.

The torch model below is an independent implementation of the documented
reference behavior (node/edge featurization, PreNorm -> edge-biased attention
-> GatedResidual -> FeedForward blocks, conservative forces as -grad of the
summed energy), using the reference's state-dict key layout. Converting its
weights through utils/convert.py into the flax GraphTransformer must
reproduce its outputs to float32 precision — validating both the converter's
orientation and the flax model's numerics in one test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward
from twoforone_tpu.utils.convert import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

N_BEADS, HIDDEN, LAYERS, HEADS, DIM_HEAD = 6, 24, 2, 8, 64
INNER = HEADS * DIM_HEAD


def make_torch_state(seed=0, conservative=True, in_node=N_BEADS + 1, in_edge=3):
    g = torch.Generator().manual_seed(seed)
    s = {}

    def lin(key, n_in, n_out):
        s[f"{key}.weight"] = torch.randn(n_out, n_in, generator=g) * 0.2
        s[f"{key}.bias"] = torch.randn(n_out, generator=g) * 0.1

    lin("node_embedding", in_node, HIDDEN)
    lin("edge_embedding", in_edge, HIDDEN)
    lin("node_decoder", HIDDEN, 1 if conservative else 3)
    for i in range(LAYERS):
        base = f"graphtransformer.layers.{i}"
        s[f"{base}.0.0.norm.weight"] = torch.rand(HIDDEN, generator=g) + 0.5
        s[f"{base}.0.0.norm.bias"] = torch.randn(HIDDEN, generator=g) * 0.1
        lin(f"{base}.0.0.fn.to_q", HIDDEN, INNER)
        lin(f"{base}.0.0.fn.to_kv", HIDDEN, 2 * INNER)
        lin(f"{base}.0.0.fn.edges_to_kv", HIDDEN, INNER)
        lin(f"{base}.0.0.fn.to_out", INNER, HIDDEN)
        s[f"{base}.0.1.proj.0.weight"] = torch.randn(1, 3 * HIDDEN, generator=g) * 0.2
        s[f"{base}.1.0.norm.weight"] = torch.rand(HIDDEN, generator=g) + 0.5
        s[f"{base}.1.0.norm.bias"] = torch.randn(HIDDEN, generator=g) * 0.1
        lin(f"{base}.1.0.fn.0", HIDDEN, HIDDEN * 4)
        lin(f"{base}.1.0.fn.2", HIDDEN * 4, HIDDEN)
        s[f"{base}.1.1.proj.0.weight"] = torch.randn(1, 3 * HIDDEN, generator=g) * 0.2
    return s


def torch_reference_forward(s, x, t_norm, conservative=True,
                            use_intrinsic=True, use_abs=False, use_dist=False):
    """Reference-semantics forward (torch), written from the behavior spec."""
    import torch.nn.functional as F

    x = x - x.mean(dim=1, keepdim=True)
    x = x.detach().requires_grad_(True)
    bs, n, _ = x.shape

    diff = x.unsqueeze(1) - x.unsqueeze(2)  # diff[b, i, j] = x_j - x_i
    if use_intrinsic and not use_dist:
        edge_attr = diff
    elif use_dist and not use_intrinsic:
        edge_attr = (diff**2).sum(-1, keepdim=True)
    elif use_dist and use_intrinsic:
        edge_attr = torch.cat([diff, (diff**2).sum(-1, keepdim=True)], dim=-1)
    else:
        edge_attr = torch.zeros(bs, n, n, 1)
    edges = F.linear(edge_attr, s["edge_embedding.weight"], s["edge_embedding.bias"])

    onehot = torch.eye(n).unsqueeze(0).repeat(bs, 1, 1)
    tfeat = t_norm.reshape(-1, 1, 1).repeat(1, n, 1)
    node_in = (
        torch.cat((onehot, x, tfeat), dim=2) if use_abs else torch.cat((onehot, tfeat), dim=2)
    )
    nodes = F.linear(node_in, s["node_embedding.weight"], s["node_embedding.bias"])

    for i in range(LAYERS):
        base = f"graphtransformer.layers.{i}"
        h = F.layer_norm(nodes, (HIDDEN,), s[f"{base}.0.0.norm.weight"],
                         s[f"{base}.0.0.norm.bias"], eps=1e-5)
        q = F.linear(h, s[f"{base}.0.0.fn.to_q.weight"], s[f"{base}.0.0.fn.to_q.bias"])
        kv = F.linear(h, s[f"{base}.0.0.fn.to_kv.weight"], s[f"{base}.0.0.fn.to_kv.bias"])
        k, v = kv.chunk(2, dim=-1)
        ekv = F.linear(edges, s[f"{base}.0.0.fn.edges_to_kv.weight"],
                       s[f"{base}.0.0.fn.edges_to_kv.bias"])
        # split heads: (b, n, h*d) -> (b*h, n, d), h-major
        def heads(tensor):
            b, *mid, _ = tensor.shape
            return (
                tensor.reshape(b, *mid, HEADS, DIM_HEAD)
                .movedim(-2, 1)
                .reshape(b * HEADS, *mid, DIM_HEAD)
            )

        qh, kh, vh, eh = heads(q), heads(k), heads(v), heads(ekv)
        kfull = kh.unsqueeze(1) + eh  # (b*h, i, j, d)
        vfull = vh.unsqueeze(1) + eh
        sim = torch.einsum("bid,bijd->bij", qh, kfull) * DIM_HEAD**-0.5
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bij,bijd->bid", attn, vfull)
        out = (
            out.reshape(bs, HEADS, n, DIM_HEAD).movedim(1, 2).reshape(bs, n, INNER)
        )
        out = F.linear(out, s[f"{base}.0.0.fn.to_out.weight"], s[f"{base}.0.0.fn.to_out.bias"])
        gate_in = torch.cat((out, nodes, out - nodes), dim=-1)
        gate = torch.sigmoid(F.linear(gate_in, s[f"{base}.0.1.proj.0.weight"]))
        nodes = out * gate + nodes * (1 - gate)

        h = F.layer_norm(nodes, (HIDDEN,), s[f"{base}.1.0.norm.weight"],
                         s[f"{base}.1.0.norm.bias"], eps=1e-5)
        ff = F.linear(h, s[f"{base}.1.0.fn.0.weight"], s[f"{base}.1.0.fn.0.bias"])
        ff = F.gelu(ff)
        ff = F.linear(ff, s[f"{base}.1.0.fn.2.weight"], s[f"{base}.1.0.fn.2.bias"])
        gate_in = torch.cat((ff, nodes, ff - nodes), dim=-1)
        gate = torch.sigmoid(F.linear(gate_in, s[f"{base}.1.1.proj.0.weight"]))
        nodes = ff * gate + nodes * (1 - gate)

    out = F.linear(nodes, s["node_decoder.weight"], s["node_decoder.bias"])
    if not conservative:
        return out.detach()
    energy = out
    grad = torch.autograd.grad(energy.sum(), x)[0]
    return (-grad).detach(), energy.detach()


def _flax_model(conservative):
    return GraphTransformer(
        num_beads=N_BEADS, hidden_nf=HIDDEN, n_layers=LAYERS,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=conservative, heads=HEADS, dim_head=DIM_HEAD,
    )


def test_converted_weights_match_reference_semantics_energy_and_forces():
    state = make_torch_state(conservative=True)
    params = torch_state_dict_to_params(state, LAYERS)

    model = _flax_model(conservative=True)
    # tree structure must match a fresh init
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, N_BEADS, 3)), jnp.zeros((1,)),
        return_energy=True,
    )["params"]
    jax.tree_util.tree_map(
        lambda a, b: None, init, params
    )  # raises on structure mismatch

    x = torch.randn(3, N_BEADS, 3, generator=torch.Generator().manual_seed(1))
    t = torch.full((3,), 0.25)
    forces_t, energy_t = torch_reference_forward(state, x, t, conservative=True)

    xj = jnp.asarray(x.numpy())
    tj = jnp.asarray(t.numpy())
    energy_j = score_forward(model, params, xj, tj, return_energy=True)
    forces_j = score_forward(model, params, xj, tj)

    np.testing.assert_allclose(
        np.asarray(energy_j), energy_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(forces_j), forces_t.numpy(), atol=2e-4, rtol=1e-3
    )


def test_converted_weights_match_nonconservative():
    state = make_torch_state(seed=2, conservative=False)
    params = torch_state_dict_to_params(state, LAYERS)
    model = _flax_model(conservative=False)
    x = torch.randn(2, N_BEADS, 3, generator=torch.Generator().manual_seed(3))
    t = torch.full((2,), 0.8)
    out_t = torch_reference_forward(state, x, t, conservative=False)
    out_j = score_forward(model, params, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-4, rtol=1e-3)


def test_roundtrip_params_to_torch_and_back():
    state = make_torch_state(seed=4)
    params = torch_state_dict_to_params(state, LAYERS)
    back = params_to_torch_state_dict(params, LAYERS)
    assert set(back.keys()) == set(state.keys())
    for k in state:
        np.testing.assert_array_equal(back[k], state[k].numpy())


def test_full_ema_pytorch_export_state_dict():
    """The exported checkpoint must hold the COMPLETE ema-pytorch 0.0.8
    EMA(GaussianDiffusion) state dict (upstream sample.py:154-167 loads it
    with strict load_state_dict): online_model.* + ema_model.* (net weights
    AND all 13 DDPM buffers from models/ddpm.py:67-138) + initted + step."""
    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.utils.convert import (
        _strip_prefix,
        build_ema_pytorch_state_dict,
    )

    state = make_torch_state(seed=5)
    params = torch_state_dict_to_params(state, LAYERS)
    model = _flax_model(conservative=True)
    gd = GaussianDiffusion(
        model=model, num_atoms=N_BEADS, timesteps=50, norm_factor=2.0,
        loss_weights="higheruntil_10",
    )

    full = build_ema_pytorch_state_dict(gd, params, step=123)

    buffer_names = [
        "betas", "alphas_cumprod", "alphas_cumprod_prev",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2", "p2_loss_weight",
    ]
    expected = {"initted", "step"}
    for prefix in ("online_model", "ema_model"):
        expected |= {f"{prefix}.model.{k}" for k in state}
        expected |= {f"{prefix}.{b}" for b in buffer_names}
    assert set(full.keys()) == expected

    # Scalar bookkeeping buffers have ema-pytorch's shapes.
    assert full["initted"].shape == (1,)
    assert full["step"].shape == (1,) and int(full["step"][0]) == 123
    # Buffers are the T-length schedule arrays.
    for b in buffer_names:
        assert full[f"ema_model.{b}"].shape == (50,)

    # Round trip: our own reference-checkpoint loader must recover the exact
    # EMA weights from the exported layout.
    recovered = torch_state_dict_to_params(_strip_prefix(full), LAYERS)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, recovered,
    )
