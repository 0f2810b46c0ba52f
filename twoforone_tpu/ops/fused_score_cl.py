"""Chain-lane fused force kernel: chains ride the 128-lane axis.

The packed fused kernel (ops/fused_score.py) and the XLA path both lay
activations out as (chains, beads, features): with N <= 56 beads every
N^2-shaped attention tensor pads its 10-wide minor dims up to 128 lanes
(12.8x wasted VPU work at N=10), and batched attention matmuls degenerate
into per-chain 80x80 MXU passes. This kernel transposes the problem:

- activations are 2D ``(features, N*B)`` with the chain block B = 128
  exactly one lane tile — projections become single large MXU matmuls
  ``(C_out, C_in) @ (C_in, N*B)`` with zero lane padding;
- attention tensors are ``(N_i, N_j, B)`` — the minor dims are (N_j, B), so
  softmax/row reductions run over sublanes and every lane does useful work
  for a different chain;
- the pairwise contractions (sim over dh, out over N_j) are
  broadcast-multiply-reduce VPU ops over 4D ``(d, N_i, N_j, B)`` views
  (elementwise only — Mosaic's no-4D-dot/reshape restrictions are
  respected; reshapes only ever split/merge the lane axis at the B=128
  tile boundary).

Supports the production edge configuration shared by all six shipped models
(``use_intrinsic_coords=True, use_abs_coords=False, use_distances=False`` —
reference saved_models/*/args.pickle); other configs fall back to the packed
kernel. The forward + in-kernel ``jax.grad`` backward run as ONE Pallas
kernel per 128-chain block, like fused_score.py (see its module docstring
for the Mosaic constraints driving both designs; reference hot loop:
dynamics/langevin_cgnet.py:737-771).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from twoforone_tpu.ops.fused_score import _gelu_exact

LANE_B = 128  # chains per block = one lane tile


def _augment_params_cl(model, params):
    """Host-side weight preparation for the chain-lane layout.

    All kernels are pre-transposed to (out_features, in_features) so every
    projection is a plain ``W @ X`` on (C, N*B) activations; per-head edge
    kernels come from the same geometric factorization as ops/attention.py
    (K_diff = W_emb_diff @ W_e etc.).
    """
    p = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    heads, dh = model.heads, model.dim_head
    inner = heads * dh
    n = model.num_beads
    col = lambda v: np.asarray(v, np.float32).reshape(-1, 1)

    w_emb = p["edge_embedding"]["kernel"]  # (3, De)
    b_emb = p["edge_embedding"]["bias"]

    out = {}
    # node embedding folded host-side: features are [onehot, t]
    # (models/graph_transformer.py:98-103 with abs_coords off), so the
    # embedded nodes are a constant (C, N) map plus t * (time column).
    wn = p["node_embedding"]["kernel"]  # (N+1, C)
    bn = p["node_embedding"]["bias"]
    h0 = wn[:n].T + bn[:, None]  # (C, N)
    out["h0"] = np.tile(h0, (1, 1))  # expanded to (C, N*B) at call time
    out["w_t"] = col(wn[n])  # (C, 1)

    layers = []
    for i in range(model.n_layers):
        attn = p[f"layers_{i}_attn"]
        w_e = attn["edges_to_kv_kernel"]  # (De, inner)
        k_comb = w_emb @ w_e  # (3, inner)
        b_comb = b_emb @ w_e + attn["edges_to_kv_bias"]  # (inner,)
        wout = attn["to_out"]["kernel"]  # (inner, C)
        d = {
            "ln1_s": col(p[f"layers_{i}_attn_norm"]["scale"]),
            "ln1_b": col(p[f"layers_{i}_attn_norm"]["bias"]),
            "wqT": attn["to_q"]["kernel"].T.copy(),  # (inner, C)
            "bq": col(attn["to_q"]["bias"]),
            "wkvT": attn["to_kv"]["kernel"].T.copy(),  # (2*inner, C)
            "bkv": col(attn["to_kv"]["bias"]),
            "woutT": wout.T.copy(),  # (C, inner)
            "b_out_total": col(b_comb @ wout + attn["to_out"]["bias"]),
            "gate1T": p[f"layers_{i}_attn_res"]["proj"]["kernel"].T.copy(),  # (1, 3C)
            "ln2_s": col(p[f"layers_{i}_ff_norm"]["scale"]),
            "ln2_b": col(p[f"layers_{i}_ff_norm"]["bias"]),
            "fc1T": p[f"layers_{i}_ff"]["fc1"]["kernel"].T.copy(),
            "fc1b": col(p[f"layers_{i}_ff"]["fc1"]["bias"]),
            "fc2T": p[f"layers_{i}_ff"]["fc2"]["kernel"].T.copy(),
            "fc2b": col(p[f"layers_{i}_ff"]["fc2"]["bias"]),
            "gate2T": p[f"layers_{i}_ff_res"]["proj"]["kernel"].T.copy(),
            # per-head geometric pieces
            "kd_h": [k_comb[:, h * dh : (h + 1) * dh].copy() for h in range(heads)],  # (3, dh)
            "bc_h": [b_comb[h * dh : (h + 1) * dh].reshape(1, dh) for h in range(heads)],
            "mdT_h": [
                (k_comb[:, h * dh : (h + 1) * dh] @ wout[h * dh : (h + 1) * dh]).T.copy()
                for h in range(heads)
            ],  # (C, 3): value-side diff map folded through to_out
        }
        layers.append(d)
    out["layers"] = layers
    out["decT"] = p["node_decoder"]["kernel"].T.copy()  # (1, C)
    out["dec_b"] = col(p["node_decoder"]["bias"])
    return out


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _ln_cols(h2d, scale, bias, eps=1e-5):
    """LayerNorm over the feature (sublane) axis of (C, NB)."""
    mean = h2d.mean(axis=0, keepdims=True)
    var = ((h2d - mean) ** 2).mean(axis=0, keepdims=True)
    return (h2d - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _remat(f):
    """Manual rematerialization: recompute ``f``'s forward inside its VJP so
    no interior residuals survive into the caller's backward pass.
    jax.checkpoint's remat2 primitive has no Mosaic lowering, hence the
    custom_vjp formulation (resolved at trace time — the final jaxpr holds
    only plain ops)."""

    @jax.custom_vjp
    def g(*args):
        return f(*args)

    def fwd(*args):
        return f(*args), args

    def bwd(res, ct):
        _, vjp = jax.vjp(f, *res)
        return vjp(ct)

    g.defvjp(fwd, bwd)
    return g


def _energy_forward_cl(x_cl, aug, model, t_val, compute_dtype=jnp.float32,
                       loop_i: bool = False, remat_scope: str = None):
    """Energy sum for one chain block. x_cl: (3, N, B) centered coords.

    ``loop_i`` replaces the 4D ``(dh, N_i, N_j, B)`` broadcast-reduce
    contractions with a static python loop over N_i producing 3D
    ``(dh, N_j, B)`` slabs — N_i-fold smaller live sets, for bead counts
    where the 4D form exceeds Mosaic's VMEM stack (N >= ~20; see
    docs/PERF_NOTES.md "Large-N status").

    ``remat_scope`` sets the granularity of the in-kernel manual remat for
    the ``jax.grad`` backward (Mosaic's stack allocator does not reuse
    buffers across the unrolled fwd+bwd, so residual live-sets are the VMEM
    bound): "layer" recomputes each transformer layer in its backward,
    "head" additionally recomputes each attention head inside the layer
    backward, "row" (requires ``loop_i``) additionally recomputes each
    attention i-row inside the head backward — the live set shrinks from
    all-layers-all-heads to roughly one (layer projections + head slabs +
    i-row) at a time. None = no interior remat (the caller may still wrap
    the whole energy, the round-2 "energy" scope).
    """
    heads, dh = model.heads, model.dim_head
    inner = heads * dh
    n = model.num_beads
    b = x_cl.shape[-1]
    nb = n * b
    scale = dh**-0.5
    cast = lambda a: a.astype(compute_dtype)
    if remat_scope == "row":
        assert loop_i, "row-scope remat is defined over the loop_i formulation"
    remat_layer = remat_scope in ("layer", "head", "row")
    remat_head = remat_scope in ("head", "row")
    remat_row = remat_scope == "row"

    def row_fn(q_i, qkd_i, qb_i, qxd_i, x_i, kh3, vh3, x3):
        """One attention i-row: q_i (dh,1,B), qkd_i (3,1,B), qb_i/qxd_i (1,B),
        x_i (3,B) vs all-j tensors kh3/vh3 (dh,N,B), x3 (3,N,B)."""
        sim_i = jnp.sum(q_i * kh3, axis=0)  # (Nj, B)
        sim_i = sim_i + qb_i
        sim_i = sim_i + jnp.sum(qkd_i * x3, axis=0)
        sim_i = sim_i - qxd_i
        attn_i = jax.nn.softmax(scale * sim_i, axis=0)  # over j
        out_i = jnp.sum(attn_i[None] * vh3, axis=1)  # (dh, B)
        fdiff_i = jnp.sum(attn_i[None] * x3, axis=1) - x_i  # (3, B)
        return out_i, fdiff_i

    if remat_row:
        row_fn = _remat(row_fn)

    def head_fn(qh, kh, vh, x3, kd, bc):
        """One attention head: qh/kh/vh (dh, NB) + coords -> out (dh, NB),
        fdiff (3, NB). The geometric q-projections (q.b_comb, q.K_diff) are
        computed inside so the head residual set is only its inputs."""
        kh3 = kh.reshape(dh, n, b)
        vh3 = vh.reshape(dh, n, b)
        qh3 = qh.reshape(dh, n, b)

        qb = _mm(cast(bc), qh).reshape(n, b)  # q . b_comb
        q_kd = _mm(cast(kd), qh).reshape(3, n, b)  # (3, N, B)
        qkd_x_diag = jnp.sum(q_kd * x3, axis=0)  # (N, B)

        if loop_i:
            # 3D slabs only: one i-row of the attention at a time.
            out_cols = []
            fdiff_cols = []
            for i in range(n):
                out_i, fdiff_i = row_fn(
                    qh3[:, i : i + 1, :],
                    q_kd[:, i : i + 1, :],
                    qb[i][None, :],
                    qkd_x_diag[i][None, :],
                    x3[:, i, :],
                    kh3,
                    vh3,
                    x3,
                )
                out_cols.append(out_i)
                fdiff_cols.append(fdiff_i)
            out_h = jnp.stack(out_cols, axis=1)  # (dh, N, B)
            fdiff = jnp.stack(fdiff_cols, axis=1)  # (3, N, B)
        else:
            # sim[i, j, b] = sum_d q[d,i,b] k[d,j,b]  (+ geometric terms)
            sim = jnp.sum(qh3[:, :, None, :] * kh3[:, None, :, :], axis=0)
            sim = sim + qb[:, None, :]
            sim = sim + jnp.sum(q_kd[:, :, None, :] * x3[:, None, :, :], axis=0)
            sim = sim - qkd_x_diag[:, None, :]

            attn = jax.nn.softmax(scale * sim, axis=1)  # over j

            # out[d, i, b] = sum_j attn[i,j,b] v[d,j,b]
            out_h = jnp.sum(attn[None, :, :, :] * vh3[:, None, :, :], axis=2)
            # fdiff[c, i, b] = sum_j attn[i,j,b] x[c,j,b] - x[c,i,b]
            fdiff = jnp.sum(attn[None, :, :, :] * x3[:, None, :, :], axis=2) - x3

        return out_h.reshape(dh, nb), fdiff.reshape(3, nb)

    if remat_head:
        head_fn = _remat(head_fn)

    def layer_fn(h, x3, d):
        h_ln = cast(_ln_cols(h, d["ln1_s"], d["ln1_b"]))
        q2 = _mm(cast(d["wqT"]), h_ln) + d["bq"]  # (inner, NB)
        kv2 = _mm(cast(d["wkvT"]), h_ln) + d["bkv"]
        k2, v2 = kv2[:inner], kv2[inner:]

        out_rows = []
        fd_acc = None
        for hh in range(heads):
            sl = slice(hh * dh, (hh + 1) * dh)
            out_h, fdiff = head_fn(
                q2[sl], k2[sl], v2[sl], x3, d["kd_h"][hh], d["bc_h"][hh]
            )
            out_rows.append(out_h)
            md = _mm(cast(d["mdT_h"][hh]), cast(fdiff))  # (C, NB)
            fd_acc = md if fd_acc is None else fd_acc + md

        out_full = jnp.concatenate(out_rows, axis=0)  # (inner, NB)
        attn_out = _mm(cast(d["woutT"]), cast(out_full)) + fd_acc + d["b_out_total"]

        gate_in = jnp.concatenate([attn_out, h, attn_out - h], axis=0)
        gate = jax.nn.sigmoid(_mm(cast(d["gate1T"]), cast(gate_in)))
        h = attn_out * gate + h * (1.0 - gate)

        h_ln2 = cast(_ln_cols(h, d["ln2_s"], d["ln2_b"]))
        ff = _mm(cast(d["fc1T"]), h_ln2) + d["fc1b"]
        ff = _gelu_exact(ff)
        ff = _mm(cast(d["fc2T"]), cast(ff)) + d["fc2b"]
        gate_in = jnp.concatenate([ff, h, ff - h], axis=0)
        gate = jax.nn.sigmoid(_mm(cast(d["gate2T"]), cast(gate_in)))
        h = ff * gate + h * (1.0 - gate)
        return h

    if remat_layer:
        layer_fn = _remat(layer_fn)

    x3 = x_cl  # (3, N, B)
    h = aug["h0"] + t_val * aug["w_t"]  # (C, NB)
    for d in aug["layers"]:
        h = layer_fn(h, x3, d)

    energy = _mm(cast(aug["decT"]), cast(h)) + aug["dec_b"]  # (1, NB)
    return jnp.sum(energy)


# Largest bead count at which the chain-lane kernel has been verified to
# Mosaic-compile on real TPU hardware and match the XLA path (the auto
# gates in dynamics/langevin.py and core/diffusion.py consult this; forcing
# fused="cl" bypasses it). Updated as verification extends.
VERIFIED_MAX_N = 10


def auto_opts(num_beads: int) -> dict:
    """Verified kernel options per bead count (docs/PERF_NOTES.md).

    N <= 10 (ala2, chignolin): the round-2 configuration — 4D attention
    slabs, whole-energy remat — compiles and wins. Larger N (trp_cage 20,
    bba 28, villin 35, protein_g 56): the 4D slabs blow the 128MB VMEM
    budget, so the loop-over-i formulation with row-scope hierarchical
    remat is used (layer+head+row recompute bounds the backward live set).
    """
    if num_beads <= 10:
        return {"remat": "energy", "loop_i": False}
    return {"remat": "row", "loop_i": True}


def make_fused_force_kernel_cl(
    model,
    params,
    t_norm: float = None,
    interpret: bool = False,
    remat=True,
    vmem_limit_mb: int = 120,
    loop_i: bool = False,
) -> Callable:
    """Chain-lane fused force kernel; signature mirrors
    :func:`twoforone_tpu.ops.fused_score.make_fused_force_kernel` with the
    block size fixed at 128 chains (one lane tile).

    Returns ``x -> eps_hat`` on (B, N, 3) arrays (B a multiple of 128) for
    fixed ``t_norm``, or ``(x, t) -> eps_hat`` when ``t_norm`` is None.

    ``vmem_limit_mb`` defaults above Mosaic's 100MB scoped default (v5e has
    128MB physical): the N=10/nf=64 kernel needs 101.3MB of scoped stack
    when compiled inside the Langevin integrator's while body, slightly
    more than standalone.

    ``remat`` sets the manual-remat granularity for the in-kernel backward:
    False = none, True or "energy" = recompute the whole forward in the
    backward (round-2 behavior, best for N <= 10), "layer"/"head"/"row" =
    hierarchical recompute at the given scope (see ``_energy_forward_cl``;
    "row" requires/implies ``loop_i``). Use :func:`auto_opts` for the
    verified per-N configuration.
    """
    assert model.conservative, "fused kernel implements the conservative path"
    assert model.use_intrinsic_coords and not model.use_abs_coords and not model.use_distances, (
        "chain-lane kernel covers the production edge config; "
        "use ops.fused_score for other configurations"
    )
    if remat is True:
        remat = "energy"
    elif remat is False:
        remat = None
    if remat == "row":
        loop_i = True
    inner_scope = remat if remat in ("layer", "head", "row") else None

    aug = _augment_params_cl(model, params)
    n = model.num_beads
    # expand the constant node embedding across the chain lanes: (C, N*B)
    aug = dict(aug)
    aug["h0"] = np.repeat(aug["h0"][:, :, None], LANE_B, axis=2).reshape(
        aug["h0"].shape[0], n * LANE_B
    )
    flat_inputs, treedef = jax.tree_util.tree_flatten(aug)
    flat_inputs = [jnp.asarray(a) for a in flat_inputs]
    runtime_t = t_norm is None

    def energy_of(xc, leaves, t_val):
        aug_t = jax.tree_util.tree_unflatten(treedef, leaves)
        f = lambda xi: _energy_forward_cl(
            xi, aug_t, model, t_val, loop_i=loop_i, remat_scope=inner_scope
        )
        if remat != "energy":
            return f(xc)
        return _remat(f)(xc)

    def kernel(*refs):
        if runtime_t:
            t_ref, x_ref = refs[0], refs[1]
            rest = refs[2:]
            t_val = t_ref[0]
        else:
            x_ref = refs[0]
            rest = refs[1:]
            t_val = t_norm
        leaves = [r[:] for r in rest[:-1]]
        out_ref = rest[-1]
        x = x_ref[:]  # (3, N, B)
        xc = x - x.mean(axis=1, keepdims=True)
        out_ref[:] = -jax.grad(lambda xi: energy_of(xi, leaves, t_val))(xc)

    def call_cl(x_cl, t=None):
        """(3, N, Btotal) -> (3, N, Btotal) chain-lane force evaluation."""
        btot = x_cl.shape[-1]
        assert btot % LANE_B == 0
        grid = (btot // LANE_B,)
        x_spec = pl.BlockSpec(
            (3, n, LANE_B), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        param_specs = [
            pl.BlockSpec(
                leaf.shape, (lambda i, nd=leaf.ndim: (0,) * nd), memory_space=pltpu.VMEM
            )
            for leaf in flat_inputs
        ]
        in_specs = [x_spec] + param_specs
        args = [x_cl] + flat_inputs
        if runtime_t:
            t_spec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
            in_specs = [t_spec] + in_specs
            args = [jnp.reshape(jnp.asarray(t, jnp.float32), (1,))] + args
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (3, n, LANE_B), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((3, n, btot), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            ),
        )(*args)

    def call(x, t=None):
        """(B, N, 3) -> (B, N, 3); transposes at the XLA level (cheap next to
        the kernel body) so callers keep the standard layout."""
        x_cl = jnp.transpose(x, (2, 1, 0))
        out = call_cl(x_cl, t) if runtime_t else call_cl(x_cl)
        return jnp.transpose(out, (2, 1, 0))

    if runtime_t:
        return call
    return lambda x: call(x)
