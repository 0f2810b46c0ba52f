"""Edge-biased dense attention over beads.

Semantics follow the reference graph-transformer attention
(models/graph_transformer.py:211-258): per head, edge embeddings are projected
and added to BOTH keys and values before a dense softmax over all beads:

    sim[i, j] = scale * q_i . (k_j + W_e e_ij + b_e)
    out[i]    = sum_j attn[i, j] * (v_j + W_e e_ij + b_e)

The naive realization materializes a per-head edge tensor of shape
(B, H, N, N, dh) — with H*dh = 512 that's 4-8x the memory traffic of the raw
edge embedding (B, N, N, De). On TPU (HBM-bandwidth bound), we instead use the
algebraically identical factorization that keeps every N^2 contraction on the
shared (B, N, N, De) tensor:

    q_i . (W_e e_ij) = (W_e^T q_i) . e_ij          -> fold W_e into q once
    sum_j a_ij (W_e e_ij) = W_e (sum_j a_ij e_ij)  -> fold W_e out of the sum
    sum_j a_ij b_e = b_e                           -> rows of attn sum to 1

Both paths are kept: ``edge_biased_attention`` (fused/factored, production)
and ``edge_biased_attention_naive`` (mirrors the reference einsums, used as a
test oracle).
"""

from __future__ import annotations

import jax.numpy as jnp


def edge_biased_attention(q, k, v, edges, w_e, b_e, scale):
    """Factored edge-biased attention.

    Args:
      q, k, v: (B, N, H, dh)
      edges:   (B, N, N, De) — shared edge embedding (already layer-normed if
               configured), indexed [b, i, j].
      w_e:     (De, H, dh) edge projection kernel.
      b_e:     (H, dh) edge projection bias.
      scale:   softmax temperature, ``dh ** -0.5``.

    Returns: (B, N, H, dh)
    """
    sim = jnp.einsum("bihd,bjhd->bhij", q, k)
    q_we = jnp.einsum("bihd,ehd->bhie", q, w_e)
    sim = sim + jnp.einsum("bhie,bije->bhij", q_we, edges)
    sim = sim + jnp.einsum("bihd,hd->bhi", q, b_e)[..., None]
    attn = _softmax_last(scale * sim)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v)
    attn_e = jnp.einsum("bhij,bije->bhie", attn, edges)
    out = out + jnp.einsum("bhie,ehd->bihd", attn_e, w_e)
    out = out + b_e[None, None]  # rows of attn sum to 1
    return out


def edge_biased_attention_naive(q, k, v, edges, w_e, b_e, scale):
    """Direct transcription of the reference attention math (test oracle)."""
    ekv = jnp.einsum("bije,ehd->bijhd", edges, w_e) + b_e[None, None, None]
    k_full = k[:, None, :, :, :] + ekv  # (B, i, j, H, dh) with k broadcast over i
    v_full = v[:, None, :, :, :] + ekv
    sim = jnp.einsum("bihd,bijhd->bhij", q, k_full) * scale
    attn = _softmax_last(sim)
    return jnp.einsum("bhij,bijhd->bihd", attn, v_full)


def _softmax_last(x):
    x = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def geometric_edge_attention_packed(q, k, v, x, k_diff, k_dist, b_comb, scale):
    """Geometric edge attention as ONE matmul per attention side (production).

    Same math as :func:`geometric_edge_attention` (softmax-identical, so
    results match to fp rounding), reorganized for the MXU at large N
    (docs/PERF_NOTES.md round 4):

    1. Every sim term that is constant along a row i — ``q·b_comb``,
       ``−(q·K_diff)·x_i``, ``(q·k_dist)·sq_i`` — shifts the whole softmax
       row equally and therefore cancels: dropped outright.
    2. The surviving edge score terms are linear in per-j features, so they
       fold into the Q·K^T contraction as extra channels:

           q̃_i = [scale·q_i,  xcoef_i,            q·k_dist]
           k̃_j = [k_j,        x_j,                 sq_j    ]
           xcoef_i = scale·(q_i K_diff − 2 (q_i·k_dist) x_i)

       (the gram term ``−2 q_ks_i x_i·x_j`` is linear in ``x_j`` too, so its
       coefficient just adds onto the diff coefficient — no (B,N,N) gram
       tensor on the score side).
    3. The value-side reductions ``attn·v``, ``attn·x`` and ``attn·sq`` fold
       into one contraction with ṽ_j = [v_j, x_j, sq_j]; the attention-gram
       reduction collapses exactly: ``Σ_j a_ij (x_i·x_j) = x_i · x̄_i``.

    Net: 2 batched (N,dh+4)x(dh+4,N)-class matmuls per layer instead of 4-6
    narrower ones plus several (B,H,N,N) adds/broadcasts — the N² tensors
    left are the logits and the attention weights, which is the information-
    theoretic minimum for dense attention. Exactness vs the naive reference
    computation is test-verified through the full model for all four edge
    configurations (tests/test_model.py).

    Args/returns: identical to :func:`geometric_edge_attention`.
    """
    b_, n, h, dh = q.shape
    has_diff = k_diff is not None
    has_dist = k_dist is not None
    qs = q * scale
    parts_q, parts_k, parts_v = [qs], [k], [v]
    if has_diff or has_dist:
        xh = jnp.broadcast_to(x[:, :, None, :], (b_, n, h, 3)).astype(q.dtype)
        parts_k.append(xh)
        parts_v.append(xh)
        xcoef = None
        if has_diff:
            xcoef = jnp.einsum("bihd,chd->bihc", qs, k_diff)
        if has_dist:
            q_ks = jnp.einsum("bihd,hd->bih", qs, k_dist)
            gram_coef = -2.0 * q_ks[..., None] * x[:, :, None, :].astype(q.dtype)
            xcoef = gram_coef if xcoef is None else xcoef + gram_coef
        parts_q.append(xcoef)
    if has_dist:
        sq = jnp.sum(x * x, axis=-1).astype(q.dtype)  # (B, N)
        sqh = jnp.broadcast_to(sq[:, :, None, None], (b_, n, h, 1))
        parts_k.append(sqh)
        parts_v.append(sqh)
        parts_q.append(q_ks[..., None])
    qt = jnp.concatenate(parts_q, axis=-1) if len(parts_q) > 1 else qs
    kt = jnp.concatenate(parts_k, axis=-1) if len(parts_k) > 1 else k
    vt = jnp.concatenate(parts_v, axis=-1) if len(parts_v) > 1 else v

    attn = _softmax_last(jnp.einsum("bihe,bjhe->bhij", qt, kt))
    ot = jnp.einsum("bhij,bjhe->bihe", attn, vt)

    out = ot[..., :dh] + b_comb[None, None]  # rows of attn sum to 1
    idx = dh
    if has_diff or has_dist:
        xbar = ot[..., idx : idx + 3]
        idx += 3
    if has_diff:
        out = out + jnp.einsum(
            "bihc,chd->bihd", xbar - x[:, :, None, :].astype(q.dtype), k_diff
        )
    if has_dist:
        sqbar = ot[..., idx]
        fdist = (
            sqbar
            + sq[:, :, None]
            - 2.0 * jnp.sum(x[:, :, None, :].astype(q.dtype) * xbar, axis=-1)
        )
        out = out + fdist[..., None] * k_dist[None, None]
    return out


def geometric_edge_attention(q, k, v, x, k_diff, k_dist, b_comb, scale):
    """Edge-biased attention with the N^2 edge tensors eliminated.

    Every edge-feature configuration of the reference
    (models/graph_transformer.py:116-140) is LINEAR in the raw geometric
    channels: coordinate differences ``diff[b,i,j] = x_j - x_i`` and squared
    distances ``dist[b,i,j] = |x_i|^2 + |x_j|^2 - 2 <x_i, x_j>``. Since both
    ``edge_embedding`` and ``edges_to_kv`` are affine maps with no
    nonlinearity between them (norm_edges is Identity in the reference,
    models/graph_transformer.py:288), the per-head edge keys/values are

        ek[b,i,j] = diff[b,i,j] @ K_diff + dist[b,i,j] * k_dist + b_comb

    with the COMBINED kernels ``K_diff = W_emb_diff @ W_e`` (3, H, dh),
    ``k_dist = w_emb_dist @ W_e`` (H, dh), ``b_comb = b_emb @ W_e + b_e``.
    Both attention contractions then decompose exactly:

      score:  q . ek = (q K_diff) . (x_j - x_i)
                       + (q k_dist) (sq_i + sq_j - 2 gram_ij) + q . b_comb
      value:  sum_j a_ij ek_ij = ((a x)_i - x_i) K_diff
                       + ((a sq)_i + sq_i - 2 (a*gram)_i) k_dist + b_comb

    eliminating ALL (B, N, N, De) and (B, H, N, N, dh) tensors — the only
    N^2 arrays left are the attention logits. Exact algebraic identity with
    the naive reference computation (test-verified).

    Args:
      q, k, v: (B, N, H, dh)
      x:       (B, N, 3) centered coordinates
      k_diff:  (3, H, dh) combined diff kernel, or None
      k_dist:  (H, dh) combined dist kernel, or None
      b_comb:  (H, dh) combined bias
      scale:   dh ** -0.5
    Returns: (B, N, H, dh)
    """
    sim = jnp.einsum("bihd,bjhd->bhij", q, k)
    sim = sim + jnp.einsum("bihd,hd->bhi", q, b_comb)[..., None]

    if k_diff is not None:
        q_kd = jnp.einsum("bihd,chd->bhic", q, k_diff)  # (B, H, N, 3)
        sim = sim + jnp.einsum("bhic,bjc->bhij", q_kd, x)
        sim = sim - jnp.einsum("bhic,bic->bhi", q_kd, x)[..., None]
    if k_dist is not None:
        sq = jnp.sum(x * x, axis=-1)  # (B, N)
        gram = jnp.einsum("bic,bjc->bij", x, x)  # (B, N, N)
        q_ks = jnp.einsum("bihd,hd->bhi", q, k_dist)  # (B, H, N)
        # dist[b,i,j] = sq_i + sq_j - 2 gram_ij, broadcast to (B, 1, N, N)
        dist = (sq[:, :, None] + sq[:, None, :] - 2.0 * gram)[:, None]
        sim = sim + q_ks[..., None] * dist

    attn = _softmax_last(scale * sim)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v)
    out = out + b_comb[None, None]  # rows of attn sum to 1

    if k_diff is not None:
        xbar = jnp.einsum("bhij,bjc->bhic", attn, x)
        # fdiff[b,h,i,c] = xbar - x_i ; x broadcast over heads
        fdiff = xbar - x[:, None, :, :]
        out = out + jnp.einsum("bhic,chd->bihd", fdiff, k_diff)
    if k_dist is not None:
        attn_sq = jnp.einsum("bhij,bj->bhi", attn, sq)
        attn_gram = jnp.einsum("bhij,bij->bhi", attn, gram)
        fdist = attn_sq + sq[:, None, :] - 2.0 * attn_gram  # (B, H, N)
        out = out + jnp.einsum("bhi,hd->bihd", fdist, k_dist)
    return out
