"""Chain-lane force evaluation for large bead counts ("clx" path).

The N <= 10 mega-kernel (ops/fused_score_cl.py) fuses the ENTIRE force
evaluation into one Pallas program; that design cannot scale past trp_cage
because Mosaic assigns every value of the unrolled program a private spill
slot (measured: 240M of register spills at N=20 — docs/PERF_NOTES.md
"Round 3"). This module keeps the chain-lane LAYOUT (activations
(C, N, B) with the chain axis minor = 128-lane tiles, zero lane padding)
but splits the work by what each engine does best:

- the N^2 geometric attention block runs as the Pallas core with a
  hand-written VJP and fori_loop rows (ops/attention_cl_core.py) —
  bounded registers and compile time at ANY bead count;
- projections / LayerNorm / gated residuals / FF stay in XLA, where
  (C_out, C) @ (C, N*B) contractions at N*B >= 2560 columns are already
  ideal MXU matmuls, and XLA's own fusion + memory planner (no 128MB
  Mosaic scope) handles the elementwise glue;
- conservative forces come from plain ``jax.grad`` of the energy at the
  XLA level — AD flows through the custom-VJP core automatically.

Same parameter preprocessing as the mega-kernel (_augment_params_cl);
same production edge config (intrinsic coords only — the configuration of
all six shipped reference models). Supports fixed or runtime t.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from twoforone_tpu.ops.attention_cl_core import LANE_B, make_cl_attention_core
from twoforone_tpu.ops.fused_score_cl import _augment_params_cl

# Measured win regime vs the XLA geometric path (scripts/bench_cl_proteins.py
# at 1024 chains, docs/PERF_NOTES.md "Round 3"): trp_cage (N=20) 1.36x,
# bba (N=28) 1.12x, villin (N=35: 33 ATOM + 2 NLE HETATM CAs) 0.95x, protein_g (N=56)
# fori_loop attention core's VPU work grows as N^2 while the XLA path's
# MXU-matmul fraction amortizes its lane padding, so clx wins in the middle
# of the size range and the XLA geometric path stays fastest at the top.
# Below ~256 chains the core under-fills the chip (0.87x at trp_cage/128).
# The auto gates engage clx only inside the measured win region.
CLX_MIN_CHAINS = 256
CLX_MAX_N = 32


def _stack_heads(aug: dict, heads: int) -> dict:
    """Per-head weight lists -> stacked arrays for einsum-side use."""
    out = dict(aug)
    layers = []
    for d in aug["layers"]:
        d = dict(d)
        d["bc"] = np.stack([b.reshape(-1) for b in d.pop("bc_h")])  # (H, dh)
        d["kd"] = np.stack(d.pop("kd_h"))  # (H, 3, dh)
        d["mdT"] = np.stack(d.pop("mdT_h"))  # (H, C, 3)
        layers.append(d)
    out["layers"] = layers
    return out


def _ln_feat(h, scale, bias, eps=1e-5):
    """LayerNorm over the feature axis of (C, N, B)."""
    mean = h.mean(axis=0, keepdims=True)
    var = ((h - mean) ** 2).mean(axis=0, keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + eps) * scale[:, :, None] + bias[:, :, None]


def _mm3(w, h):
    """(C_out, C_in) @ (C_in, N, B) -> (C_out, N, B)."""
    return jax.lax.dot_general(
        w, h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _energy_clx(x3, aug, model, t_val, core):
    """Summed energy for (3, N, B) centered chain-lane coordinates."""
    heads, dh = model.heads, model.dim_head
    inner = heads * dh
    n = model.num_beads
    b = x3.shape[-1]

    h = aug["h0"][:, :, None] + t_val * aug["w_t"][:, :, None]  # (C, N, 1)
    h = jnp.broadcast_to(h, (h.shape[0], n, b))
    for d in aug["layers"]:
        h_ln = _ln_feat(h, d["ln1_s"], d["ln1_b"])
        q2 = _mm3(d["wqT"], h_ln) + d["bq"][:, :, None]  # (inner, N, B)
        kv2 = _mm3(d["wkvT"], h_ln) + d["bkv"][:, :, None]
        q4 = q2.reshape(heads, dh, n, b)
        k4 = kv2[:inner].reshape(heads, dh, n, b)
        v4 = kv2[inner:].reshape(heads, dh, n, b)

        qb = jnp.einsum("hd,hdnb->hnb", d["bc"], q4)  # q . b_comb
        qkd = jnp.einsum("hcd,hdnb->hcnb", d["kd"], q4)  # q . K_diff

        out4, fd4 = core(q4, k4, v4, x3, qb, qkd)

        attn_out = _mm3(d["woutT"], out4.reshape(inner, n, b))
        attn_out = attn_out + jnp.einsum("hcr,hrnb->cnb", d["mdT"], fd4)
        attn_out = attn_out + d["b_out_total"][:, :, None]

        gate_in = jnp.concatenate([attn_out, h, attn_out - h], axis=0)
        gate = jax.nn.sigmoid(_mm3(d["gate1T"], gate_in))
        h = attn_out * gate + h * (1.0 - gate)

        h_ln2 = _ln_feat(h, d["ln2_s"], d["ln2_b"])
        ff = _mm3(d["fc1T"], h_ln2) + d["fc1b"][:, :, None]
        ff = jax.nn.gelu(ff, approximate=False)
        ff = _mm3(d["fc2T"], ff) + d["fc2b"][:, :, None]
        gate_in = jnp.concatenate([ff, h, ff - h], axis=0)
        gate = jax.nn.sigmoid(_mm3(d["gate2T"], gate_in))
        h = ff * gate + h * (1.0 - gate)

    energy = _mm3(aug["decT"], h) + aug["dec_b"][:, :, None]  # (1, N, B)
    return jnp.sum(energy)


def make_clx_force_fn(
    model, params, t_norm: float = None, interpret: bool = False
) -> Callable:
    """Build the clx score evaluation: ``x -> eps_hat`` for fixed ``t_norm``,
    or ``(x, t) -> eps_hat`` when ``t_norm`` is None (runtime t — plain
    traced scalar here, no SMEM plumbing needed since the wrapper is XLA).

    x: (B, N, 3), any B (padded internally to a 128 multiple). Output
    follows the score-model convention eps_hat = -dE/dx, identical to
    ``score_forward``; callers apply their own force rescale (reference
    dynamics/langevin.py:78-87).
    """
    assert model.conservative, "clx implements the conservative path"
    assert (
        model.use_intrinsic_coords
        and not model.use_abs_coords
        and not model.use_distances
    ), "clx covers the production edge config"
    heads, dh, n = model.heads, model.dim_head, model.num_beads
    aug = _stack_heads(_augment_params_cl(model, params), heads)
    leaves, treedef = jax.tree_util.tree_flatten(aug)
    leaves = [jnp.asarray(a) for a in leaves]
    core = make_cl_attention_core(heads, dh, n, interpret=interpret)
    runtime_t = t_norm is None

    def eps_hat(x, t_val):
        b = x.shape[0]
        pad = (-b) % LANE_B
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0
            )
        x3 = jnp.transpose(x, (2, 1, 0))  # (3, N, Bp)
        x3 = x3 - x3.mean(axis=1, keepdims=True)
        aug_t = jax.tree_util.tree_unflatten(treedef, leaves)
        grad_fn = jax.grad(
            lambda xc: _energy_clx(xc, aug_t, model, t_val, core)
        )
        out = -grad_fn(x3)  # eps_hat = -dE/dx
        out = jnp.transpose(out, (2, 1, 0))
        return out[:b] if pad else out

    if runtime_t:
        return lambda x, t: eps_hat(x, jnp.asarray(t, jnp.float32))
    return lambda x: eps_hat(x, jnp.float32(t_norm))
