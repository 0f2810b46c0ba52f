"""Graph-transformer score network (flax).

Re-design of the reference score net (models/graph_transformer.py:18-329) for
TPU/JAX:

- Dense edge-biased attention over beads, computed with the factored
  formulation in :mod:`twoforone_tpu.ops.attention` (no per-head N^2 edge
  tensors in HBM).
- ``conservative=True`` predicts a scalar per-node energy; forces are
  ``-jax.grad`` of the summed energy (:func:`score_forward`). This replaces
  the reference's ``torch.autograd.grad(create_graph=True)`` double-backward
  (models/graph_transformer.py:143-159) — in JAX the extra derivative is just
  another composed transform and fuses into one XLA program.

Behavioral contract matched to the reference:
- node features = [bead one-hot, (abs coords)?, normalized time]
  (models/graph_transformer.py:98-103),
- edge features = coordinate differences and/or *squared* distances
  (models/graph_transformer.py:116-140); ``diff[i, j] = x_j - x_i``,
- per block: PreNorm(LayerNorm) -> Attention -> GatedResidual, then
  PreNorm -> FeedForward(4x, exact GELU) -> GatedResidual
  (models/graph_transformer.py:292-327),
- the attention mask is all-ones in every reference call site, so no masking
  is implemented.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from twoforone_tpu.ops.attention import edge_biased_attention
from twoforone_tpu.ops.geometry import center_zero


class GatedResidual(nn.Module):
    """sigmoid-gated residual merge (reference models/graph_transformer.py:197-205)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res):
        gate_in = jnp.concatenate([x, res, x - res], axis=-1)
        gate = nn.sigmoid(
            nn.Dense(1, use_bias=False, name="proj", dtype=self.dtype)(gate_in)
        )
        return x * gate + res * (1.0 - gate)


class Attention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, nodes, edges):
        b, n, _ = nodes.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, name="to_q", dtype=self.dtype)(nodes)
        kv = nn.Dense(2 * inner, name="to_kv", dtype=self.dtype)(nodes)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, n, self.heads, self.dim_head)
        v = v.reshape(b, n, self.heads, self.dim_head)

        edge_dim = edges.shape[-1]
        w_e = self.param(
            "edges_to_kv_kernel",
            nn.initializers.lecun_normal(),
            (edge_dim, inner),
        ).astype(self.dtype)
        b_e = self.param(
            "edges_to_kv_bias", nn.initializers.zeros, (inner,)
        ).astype(self.dtype)

        out = edge_biased_attention(
            q,
            k,
            v,
            edges,
            w_e.reshape(edge_dim, self.heads, self.dim_head),
            b_e.reshape(self.heads, self.dim_head),
            self.dim_head**-0.5,
        )
        out = out.reshape(b, n, inner)
        return nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim * self.mult, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2", dtype=self.dtype)(x)


class GraphTransformer(nn.Module):
    """Score network over (B, num_beads, 3) coordinates.

    ``__call__`` expects coordinates that are already mean-centered (the
    diffusion/dynamics pipelines maintain the zero-CoM invariant); it returns
    predicted noise/forces of shape (B, N, 3), or per-node energies (B, N, 1)
    with ``return_energy=True`` in conservative mode.
    """

    num_beads: int
    hidden_nf: int
    n_layers: int = 4
    use_intrinsic_coords: bool = False
    use_abs_coords: bool = True
    use_distances: bool = True
    conservative: bool = True
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    def edge_features(self, x):
        """Edge attributes (reference models/graph_transformer.py:116-140).

        Distances are *squared* pairwise distances; ``diff[b, i, j] = x_j - x_i``.
        """
        diff = x[:, None, :, :] - x[:, :, None, :]
        if self.use_distances and not self.use_intrinsic_coords:
            return jnp.sum(diff**2, axis=-1, keepdims=True)
        if self.use_intrinsic_coords and not self.use_distances:
            return diff
        if self.use_intrinsic_coords and self.use_distances:
            dist = jnp.sum(diff**2, axis=-1, keepdims=True)
            return jnp.concatenate([diff, dist], axis=-1)
        b, n, _ = x.shape
        return jnp.zeros((b, n, n, 1), dtype=x.dtype)

    @nn.compact
    def __call__(self, x, t, return_energy: bool = False):
        b, n, _ = x.shape
        assert n == self.num_beads, f"expected {self.num_beads} beads, got {n}"
        x = x.astype(self.dtype)
        # Node features: one-hot bead identity (+ abs coords) + normalized time.
        onehot = jnp.broadcast_to(
            jnp.eye(self.num_beads, dtype=self.dtype), (b, n, n)
        )
        t_feat = jnp.broadcast_to(
            jnp.reshape(t.astype(self.dtype), (b, 1, 1)), (b, n, 1)
        )
        if self.use_abs_coords:
            node_in = jnp.concatenate([onehot, x, t_feat], axis=-1)
        else:
            node_in = jnp.concatenate([onehot, t_feat], axis=-1)

        nodes = nn.Dense(self.hidden_nf, name="node_embedding", dtype=self.dtype)(
            node_in
        )
        edges = nn.Dense(self.hidden_nf, name="edge_embedding", dtype=self.dtype)(
            self.edge_features(x)
        )

        for i in range(self.n_layers):
            attn_in = nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_attn_norm")(nodes)
            attn_out = Attention(
                dim=self.hidden_nf,
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(attn_in, edges)
            nodes = GatedResidual(dtype=self.dtype, name=f"layers_{i}_attn_res")(
                attn_out, nodes
            )

            ff_in = nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_ff_norm")(nodes)
            ff_out = FeedForward(
                dim=self.hidden_nf, dtype=self.dtype, name=f"layers_{i}_ff"
            )(ff_in)
            nodes = GatedResidual(dtype=self.dtype, name=f"layers_{i}_ff_res")(
                ff_out, nodes
            )

        out_dim = 1 if self.conservative else 3
        out = nn.Dense(out_dim, name="node_decoder", dtype=self.dtype)(nodes)
        if self.conservative and not return_energy:
            raise ValueError(
                "conservative GraphTransformer outputs energies; use score_forward "
                "to obtain forces via jax.grad"
            )
        return out.astype(jnp.float32)


def score_forward(
    model: GraphTransformer,
    params,
    x: jnp.ndarray,
    t: jnp.ndarray,
    return_energy: bool = False,
):
    """Model forward in "score" convention: returns (B, N, 3) noise/forces.

    Centers the input (translation invariance, reference
    models/graph_transformer.py:87) and, in conservative mode, differentiates
    the summed per-node energy w.r.t. the *centered* coordinates — matching
    the reference's autograd.grad through post-centering positions.
    """
    xc = center_zero(x)
    if not model.conservative:
        return model.apply({"params": params}, xc, t)
    if return_energy:
        return model.apply({"params": params}, xc, t, return_energy=True)

    def energy_sum(xi):
        return model.apply({"params": params}, xi, t, return_energy=True).sum()

    return -jax.grad(energy_sum)(xc)


def make_score_fn(model: GraphTransformer, params):
    """Closure ``(x, t_norm) -> eps_hat`` used by diffusion/dynamics loops."""

    def fn(x, t_norm):
        return score_forward(model, params, x, t_norm)

    return fn
