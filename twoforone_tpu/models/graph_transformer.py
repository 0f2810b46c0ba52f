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

from twoforone_tpu.ops.attention import (
    edge_biased_attention,
    geometric_edge_attention_packed,
)
from twoforone_tpu.ops.geometry import center_zero


class LinearParams(nn.Module):
    """Holds Dense-compatible (kernel, bias) without applying them.

    Used for ``edge_embedding``: its weights are algebraically folded into
    each attention layer's edge projection (see geometric_edge_attention), so
    the map is never applied to an N^2 tensor — but the parameter tree stays
    identical to an nn.Dense for checkpoint/converter compatibility.
    """

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.features_in, self.features_out)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


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
    """Edge-biased attention over beads.

    Two execution paths with identical math:
    - geometric (production): edge kernels folded onto the raw geometric
      channels, no N^2 feature tensors (ops/attention.py
      geometric_edge_attention),
    - general: explicit (B, N, N, De) hidden edge tensor
      (ops/attention.py edge_biased_attention), kept as the oracle and for
      future nonlinear edge featurizations (e.g. RBF).
    """

    dim: int
    edge_dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, nodes, edges=None, geom=None):
        b, n, _ = nodes.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, name="to_q", dtype=self.dtype)(nodes)
        kv = nn.Dense(2 * inner, name="to_kv", dtype=self.dtype)(nodes)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, n, self.heads, self.dim_head)
        v = v.reshape(b, n, self.heads, self.dim_head)

        w_e = self.param(
            "edges_to_kv_kernel",
            nn.initializers.lecun_normal(),
            (self.edge_dim, inner),
        ).astype(self.dtype)
        b_e = self.param(
            "edges_to_kv_bias", nn.initializers.zeros, (inner,)
        ).astype(self.dtype)
        scale = self.dim_head**-0.5

        if geom is not None:
            x, w_emb, b_emb, has_diff, has_dist = geom
            # Fold edge_embedding and edges_to_kv into one affine map of the
            # raw channels: K_comb (C, H, dh), b_comb (H, dh).
            k_comb = (w_emb.astype(self.dtype) @ w_e).reshape(
                -1, self.heads, self.dim_head
            )
            b_comb = (b_emb.astype(self.dtype) @ w_e + b_e).reshape(
                self.heads, self.dim_head
            )
            k_diff = k_comb[:3] if has_diff else None
            k_dist = k_comb[3 if has_diff else 0] if has_dist else None
            out = geometric_edge_attention_packed(
                q, k, v, x.astype(self.dtype), k_diff, k_dist, b_comb, scale
            )
        else:
            out = edge_biased_attention(
                q,
                k,
                v,
                edges,
                w_e.reshape(self.edge_dim, self.heads, self.dim_head),
                b_e.reshape(self.heads, self.dim_head),
                scale,
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
    # Geometric path: fold the (linear) edge pipeline onto raw diff/dist
    # channels so no N^2 feature tensor is ever materialized. Identical math
    # (test-verified); disable only for debugging/oracle comparison.
    use_geometric_edges: bool = True

    @property
    def edge_in_dim(self) -> int:
        return (
            3 * self.use_intrinsic_coords
            + self.use_distances
            + int(not self.use_intrinsic_coords and not self.use_distances)
        )

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
        w_emb, b_emb = LinearParams(
            self.edge_in_dim, self.hidden_nf, name="edge_embedding"
        )()
        if self.use_geometric_edges:
            # neither diff nor dist (zero-feature config) -> bias-only edges
            geom = (x, w_emb, b_emb, self.use_intrinsic_coords, self.use_distances)
            edges = None
        else:
            geom = None
            edges = (
                self.edge_features(x) @ w_emb.astype(self.dtype)
                + b_emb.astype(self.dtype)
            )

        for i in range(self.n_layers):
            attn_in = nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_attn_norm")(nodes)
            attn_out = Attention(
                dim=self.hidden_nf,
                edge_dim=self.hidden_nf,
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(attn_in, edges=edges, geom=geom)
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
