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
