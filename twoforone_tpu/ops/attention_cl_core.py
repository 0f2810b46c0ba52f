"""Chain-lane attention core: the N^2 block as a small Pallas kernel.

The round-3 measurement (docs/PERF_NOTES.md "Round 3") showed the
single-mega-kernel fused force evaluation cannot scale past N ~ 10: Mosaic's
register allocator gives every value of the fully unrolled fwd+bwd program
its own spill slot, so program length — not the live set — is the VMEM
bound. This module is the scalable design:

- ONLY the geometric edge-biased attention (the part whose (N_i, N_j)
  shapes XLA tiles worst) runs as a Pallas kernel, with chains on the
  128-lane axis so every lane does useful work for a different chain
  (same layout argument as ops/fused_score_cl.py);
- the kernel body is a ``jax.lax.fori_loop`` over attention rows with heads
  on the grid, so register pressure is ONE row body at any bead count;
- the backward is a HAND-WRITTEN VJP (a second fori_loop kernel) — no
  in-kernel jax.grad, no unrolled recompute program;
- everything around it (projections, LayerNorm, gated residuals, FF) stays
  in XLA in the same chain-lane (C, N, B) layout, where at N*B >= 2560
  columns those matmuls are already ideal MXU work — see
  ops/fused_score_clx.py.

Math per head (scale = dh^-0.5; e[c,i,j,b] = x[c,j,b] - x[c,i,b]):

    sim[i,j,b] = sum_d q[d,i,b] k[d,j,b] + qb[i,b] + sum_c qkd[c,i,b] e[c,i,j,b]
    attn       = softmax_j(scale * sim)
    out[d,i,b] = sum_j attn[i,j,b] v[d,j,b]
    fdiff[c,i,b] = sum_j attn[i,j,b] x[c,j,b] - x[c,i,b]

which is exactly the factored geometric attention of ops/attention.py
(reference models/graph_transformer.py:211-271 semantics) with the
q-side projections (qb = q . b_comb, qkd = q . K_diff) precomputed by the
caller as plain matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_B = 128


def _sim_row(i, q_ref, k_all, x_all, qb_ref, qkd_ref, x_ref, scale):
    """Attention logits row i: (N_j, B), plus the slices reused by callers."""
    qi = q_ref[0, :, pl.ds(i, 1), :]  # (dh, 1, B)
    qkdi = qkd_ref[0, :, pl.ds(i, 1), :]  # (3, 1, B)
    xi = x_ref[:, pl.ds(i, 1), :]  # (3, 1, B)
    sim = jnp.sum(qi * k_all, axis=0)  # (N, B)
    sim = sim + qb_ref[0, pl.ds(i, 1), :]
    sim = sim + jnp.sum(qkdi * x_all, axis=0)
    sim = sim - jnp.sum(qkdi * xi, axis=0)
    attn = jax.nn.softmax(scale * sim, axis=0)  # over j
    return attn, qi, qkdi, xi


def _fwd_kernel(q_ref, k_ref, v_ref, x_ref, qb_ref, qkd_ref, out_ref, fd_ref,
                *, n, scale):
    k_all = k_ref[0]  # (dh, N, B)
    v_all = v_ref[0]
    x_all = x_ref[...]  # (3, N, B)

    def body(i, _):
        attn, _, _, xi = _sim_row(
            i, q_ref, k_all, x_all, qb_ref, qkd_ref, x_ref, scale
        )
        out_ref[0, :, pl.ds(i, 1), :] = jnp.sum(
            attn[None] * v_all, axis=1, keepdims=True
        )
        fd_ref[0, :, pl.ds(i, 1), :] = (
            jnp.sum(attn[None] * x_all, axis=1, keepdims=True) - xi
        )
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, x_ref, qb_ref, qkd_ref, dout_ref, dfd_ref,
                dq_ref, dk_ref, dv_ref, dqb_ref, dqkd_ref, dxh_ref,
                *, n, scale):
    """Hand-derived VJP of _fwd_kernel (one head, one chain block).

    Per-row accumulators (dk, dv, dx) ride the fori_loop carry; per-row
    outputs (dq, dqb, dqkd) store directly at row i.
    """
    k_all = k_ref[0]
    v_all = v_ref[0]
    x_all = x_ref[...]

    def body(i, carry):
        dk, dv, dx = carry
        attn, qi, qkdi, xi = _sim_row(
            i, q_ref, k_all, x_all, qb_ref, qkd_ref, x_ref, scale
        )
        do_i = dout_ref[0, :, pl.ds(i, 1), :]  # (dh, 1, B)
        dfd_i = dfd_ref[0, :, pl.ds(i, 1), :]  # (3, 1, B)

        # dL/d attn[i, j] = sum_d v[d,j] dout[d,i] + sum_c x[c,j] dfd[c,i]
        dattn = jnp.sum(v_all * do_i, axis=0) + jnp.sum(x_all * dfd_i, axis=0)
        # softmax backward (with the pre-softmax scale)
        tot = jnp.sum(dattn * attn, axis=0, keepdims=True)  # (1, B)
        dsim = scale * attn * (dattn - tot)  # (N, B)

        dq_ref[0, :, pl.ds(i, 1), :] = jnp.sum(
            dsim[None] * k_all, axis=1, keepdims=True
        )
        sum_dsim = jnp.sum(dsim, axis=0, keepdims=True)  # (1, B)
        dqb_ref[0, pl.ds(i, 1), :] = sum_dsim
        dqkd_ref[0, :, pl.ds(i, 1), :] = jnp.sum(
            dsim[None] * (x_all - xi), axis=1, keepdims=True
        )

        dk = dk + dsim[None] * qi
        dv = dv + attn[None] * do_i
        # dx column contributions (j = all): dsim_ij qkd_i + attn_ij dfd_i
        dx = dx + dsim[None] * qkdi + attn[None] * dfd_i
        # dx row-i contribution: -(sum_j dsim_ij) qkd_i - dfd_i
        row_contrib = -(sum_dsim * qkdi) - dfd_i  # (3, 1, B)
        row_mask = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) == i
        dx = dx + jnp.where(row_mask, row_contrib, 0.0)
        return dk, dv, dx

    dk0 = jnp.zeros_like(k_all)
    dv0 = jnp.zeros_like(v_all)
    dx0 = jnp.zeros_like(x_all)
    dk, dv, dx = jax.lax.fori_loop(0, n, body, (dk0, dv0, dx0))
    dk_ref[0] = dk
    dv_ref[0] = dv
    dxh_ref[0] = dx


def _specs(heads, dh, n, per_head_shapes):
    """BlockSpecs for grid (B // LANE_B, H)."""
    specs = []
    for shape in per_head_shapes:
        if shape == "hdnb":
            specs.append(pl.BlockSpec(
                (1, dh, n, LANE_B), lambda b, h: (h, 0, 0, b),
                memory_space=pltpu.VMEM,
            ))
        elif shape == "h3nb":
            specs.append(pl.BlockSpec(
                (1, 3, n, LANE_B), lambda b, h: (h, 0, 0, b),
                memory_space=pltpu.VMEM,
            ))
        elif shape == "hnb":
            specs.append(pl.BlockSpec(
                (1, n, LANE_B), lambda b, h: (h, 0, b),
                memory_space=pltpu.VMEM,
            ))
        elif shape == "3nb":
            specs.append(pl.BlockSpec(
                (3, n, LANE_B), lambda b, h: (0, 0, b),
                memory_space=pltpu.VMEM,
            ))
        else:
            raise ValueError(shape)
    return specs


def make_cl_attention_core(heads: int, dh: int, n: int, interpret: bool = False):
    """Build the differentiable core: (q, k, v, x, qb, qkd) -> (out, fdiff).

    q/k/v: (H, dh, N, B); x: (3, N, B); qb: (H, N, B); qkd: (H, 3, N, B);
    B a multiple of 128. Returns out (H, dh, N, B), fdiff (H, 3, N, B).
    Differentiable via a hand-written VJP (both directions are fori_loop
    Pallas kernels; no unrolled program, so compile time and register
    pressure are bounded at any N).
    """
    scale = dh**-0.5

    def fwd_call(q, k, v, x, qb, qkd):
        b = q.shape[-1]
        assert b % LANE_B == 0, f"B={b} must be a multiple of {LANE_B}"
        grid = (b // LANE_B, heads)
        in_specs = _specs(heads, dh, n,
                          ["hdnb", "hdnb", "hdnb", "3nb", "hnb", "h3nb"])
        out_specs = _specs(heads, dh, n, ["hdnb", "h3nb"])
        return pl.pallas_call(
            partial(_fwd_kernel, n=n, scale=scale),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((heads, dh, n, b), jnp.float32),
                jax.ShapeDtypeStruct((heads, 3, n, b), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                # windows + loop accumulators exceed the default 16MB scoped
                # budget slightly at large N; plenty of physical VMEM (128MB)
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(q, k, v, x, qb, qkd)

    def bwd_call(q, k, v, x, qb, qkd, dout, dfd):
        b = q.shape[-1]
        grid = (b // LANE_B, heads)
        in_specs = _specs(heads, dh, n,
                          ["hdnb", "hdnb", "hdnb", "3nb", "hnb", "h3nb",
                           "hdnb", "h3nb"])
        out_specs = _specs(heads, dh, n,
                           ["hdnb", "hdnb", "hdnb", "hnb", "h3nb", "h3nb"])
        return pl.pallas_call(
            partial(_bwd_kernel, n=n, scale=scale),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((heads, dh, n, b), jnp.float32),  # dq
                jax.ShapeDtypeStruct((heads, dh, n, b), jnp.float32),  # dk
                jax.ShapeDtypeStruct((heads, dh, n, b), jnp.float32),  # dv
                jax.ShapeDtypeStruct((heads, n, b), jnp.float32),      # dqb
                jax.ShapeDtypeStruct((heads, 3, n, b), jnp.float32),   # dqkd
                jax.ShapeDtypeStruct((heads, 3, n, b), jnp.float32),   # dx/head
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(q, k, v, x, qb, qkd, dout, dfd)

    @jax.custom_vjp
    def core(q, k, v, x, qb, qkd):
        return tuple(fwd_call(q, k, v, x, qb, qkd))

    def fwd(q, k, v, x, qb, qkd):
        out = fwd_call(q, k, v, x, qb, qkd)
        return tuple(out), (q, k, v, x, qb, qkd)

    def bwd(res, cts):
        dout, dfd = cts
        dq, dk, dv, dqb, dqkd, dxh = bwd_call(*res, dout, dfd)
        return dq, dk, dv, jnp.sum(dxh, axis=0), dqb, dqkd

    core.defvjp(fwd, bwd)
    return core


def cl_attention_reference(q, k, v, x, qb, qkd):
    """Pure-jnp oracle for the core (same math, XLA everywhere); used by
    tests to check both the forward and the hand-written VJP."""
    dh = q.shape[1]
    scale = dh**-0.5
    sim = jnp.einsum("hdib,hdjb->hijb", q, k)
    sim = sim + qb[:, :, None, :]
    # e[c,i,j,b] = x[c,j,b] - x[c,i,b]
    e = x[:, None, :, :] - x[:, :, None, :]
    sim = sim + jnp.einsum("hcib,cijb->hijb", qkd, e)
    attn = jax.nn.softmax(scale * sim, axis=2)
    out = jnp.einsum("hijb,hdjb->hdib", attn, v)
    fdiff = jnp.einsum("hijb,cjb->hcib", attn, x) - x[None]
    return out, fdiff
