"""Pure-jnp molecular geometry ops.

The reference keeps these utilities in torch (utils.py) and leans on mdtraj
for dihedrals/RMSD (evaluate/evaluators_CGflowmatching.py:32-38,
evaluate/evaluators.py:662). Here everything is jnp so it can live inside
jit/scan hot loops on TPU; mdtraj conventions are reproduced exactly so golden
references remain comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def center_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Move each molecule's center of geometry to zero (reference utils.py:65-70).

    ``x``: (..., N, 3); mean is removed over the bead axis.
    """
    return x - x.mean(axis=-2, keepdims=True)


def assert_center_zero(x, eps: float = 1e-3) -> None:
    """Host-side invariant check (reference utils.py:73-86).

    Only call outside jit (tests / debug paths); the jitted pipeline maintains
    the invariant by construction via :func:`center_zero`.
    """
    x = np.asarray(x)
    assert x.ndim >= 2 and x.shape[-1] == 3, "Dimensionality error"
    center_max = float(np.abs(x.mean(axis=-2)).max())
    if center_max >= eps:
        raise AssertionError(f"Center not at zero: abs max at {center_max}")


def random_rotation_matrices(key: jax.Array, batch: int) -> jnp.ndarray:
    """Per-sample composed Euler rotations R = Rz @ Ry @ Rx, each angle ~U(-pi, pi).

    Same distribution as the reference's SO(3) data augmentation
    (utils.py:89-144), built as one batched 3x3 matmul chain on device.
    """
    thetas = jax.random.uniform(key, (3, batch), minval=-jnp.pi, maxval=jnp.pi)
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    zeros = jnp.zeros((batch,))
    ones = jnp.ones((batch,))
    # Row-major stacks; each (batch, 3, 3)
    rx = jnp.stack(
        [ones, zeros, zeros, zeros, c[0], s[0], zeros, -s[0], c[0]], axis=-1
    ).reshape(batch, 3, 3)
    ry = jnp.stack(
        [c[1], zeros, -s[1], zeros, ones, zeros, s[1], zeros, c[1]], axis=-1
    ).reshape(batch, 3, 3)
    rz = jnp.stack(
        [c[2], s[2], zeros, -s[2], c[2], zeros, zeros, zeros, ones], axis=-1
    ).reshape(batch, 3, 3)
    # Reference applies x -> Rx x, then Ry, then Rz (on column vectors).
    return jnp.einsum("bij,bjk,bkl->bil", rz, ry, rx)


def random_rotation(x: jnp.ndarray, key: jax.Array, return_matrices: bool = False):
    """Apply an independent random rotation to each molecule in the batch."""
    rot = random_rotation_matrices(key, x.shape[0])
    out = jnp.einsum("bij,bnj->bni", rot, x)
    if return_matrices:
        return out, rot
    return out


def reverse_rotation(x: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Undo :func:`random_rotation` (rotations are orthogonal: inverse = transpose)."""
    return jnp.einsum("bji,bnj->bni", rot, x)


def pairwise_distances(x: jnp.ndarray) -> jnp.ndarray:
    """Full (..., N, N) Euclidean pairwise-distance matrix."""
    diff = x[..., :, None, :] - x[..., None, :, :]
    return jnp.linalg.norm(diff, axis=-1)


def triu_indices(n: int, offset: int) -> tuple[np.ndarray, np.ndarray]:
    return np.triu_indices(n, k=offset)


def pwd_triu_batch(x, offset: int = 1) -> jnp.ndarray:
    """Upper-triangle pairwise distances for a batch (reference
    evaluate/evaluators.py:934-948). ``x``: (B, N, 3) -> (B, n_pairs)."""
    x = jnp.asarray(x)
    assert x.ndim == 3 and x.shape[-1] == 3, "Shape mismatch"
    pwd = pairwise_distances(x)
    iu, ju = triu_indices(x.shape[1], offset)
    return pwd[:, iu, ju]


def dihedrals(xyz: jnp.ndarray, indices) -> jnp.ndarray:
    """Signed dihedral angles with mdtraj's sign convention.

    Matches ``mdtraj.compute_dihedrals``:
      b1 = p1-p0, b2 = p2-p1, b3 = p3-p2
      angle = atan2( (b1 x b2) . b3 * |b2|, (b2 x b3) . (b1 x b2) )

    ``xyz``: (B, N, 3); ``indices``: (M, 4) int -> (B, M) radians in [-pi, pi].
    (Angles are unit-free, so Angstrom coordinates need no nm conversion.)
    """
    idx = jnp.asarray(indices)
    p = xyz[:, idx, :]  # (B, M, 4, 3)
    b1 = p[..., 1, :] - p[..., 0, :]
    b2 = p[..., 2, :] - p[..., 1, :]
    b3 = p[..., 3, :] - p[..., 2, :]
    c1 = jnp.cross(b2, b3)
    c2 = jnp.cross(b1, b2)
    p1 = jnp.sum(b1 * c1, axis=-1) * jnp.linalg.norm(b2, axis=-1)
    p2 = jnp.sum(c1 * c2, axis=-1)
    return jnp.arctan2(p1, p2)


def sliding_dihedral_indices(num_beads: int) -> np.ndarray:
    """All consecutive 4-mers along the chain — the TICA feature dihedrals
    (reference evaluate/evaluators.py:439-441)."""
    ind = np.arange(0, num_beads - 3)
    return np.stack((ind, ind + 1, ind + 2, ind + 3)).T


def unsorted_segment_sum(data, segment_ids, num_segments, normalization_factor,
                         aggregation_method: str):
    """Segment sum/mean (reference utils.py:161-180; kept for API parity —
    the dense-attention main path does not use it)."""
    seg = jax.ops.segment_sum(data, segment_ids, num_segments)
    if aggregation_method == "sum":
        return seg / normalization_factor
    if aggregation_method == "mean":
        counts = jax.ops.segment_sum(jnp.ones_like(data), segment_ids, num_segments)
        return seg / jnp.maximum(counts, 1.0)
    raise ValueError(f"unknown aggregation {aggregation_method}")


def superpose(xyz: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Optimally superpose each frame onto ``ref`` (Kabsch), like
    ``mdtraj.Trajectory.superpose`` (reference dataset_utils_empty.py:320-321).

    ``xyz``: (B, N, 3); ``ref``: (N, 3) -> (B, N, 3) aligned frames, centered
    at the reference's centroid.
    """
    x = center_zero(xyz)
    ref_mean = ref.mean(axis=0, keepdims=True)
    r = ref - ref_mean
    cov = jnp.einsum("bni,nj->bij", x, r)
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1)
    rot = jnp.einsum("bij,bj,bjk->bik", u, d, vt)
    return jnp.einsum("bni,bij->bnj", x, rot) + ref_mean[None]


def kabsch_rmsd(xyz: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Minimum RMSD of each frame to ``ref`` after optimal superposition.

    jnp equivalent of ``mdtraj.rmsd`` (Theobald QCP result computed via the
    Kabsch SVD route): both structures are centered, the optimal rotation is
    applied, and the RMSD over beads returned. ``xyz``: (B, N, 3); ``ref``:
    (N, 3) -> (B,).
    """
    x = center_zero(xyz)
    r = ref - ref.mean(axis=0, keepdims=True)
    # Covariance per frame: (B, 3, 3)
    cov = jnp.einsum("bni,nj->bij", x, r)
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vt))
    # Proper rotation: flip the smallest singular value's axis if det < 0.
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1)
    # Optimal rotation R = u diag(d) vt; apply explicitly and measure — avoids
    # the catastrophic cancellation of the |x|^2 + |r|^2 - 2 tr(S) shortcut
    # in float32.
    rot = jnp.einsum("bij,bj,bjk->bik", u, d, vt)  # (B, 3, 3)
    x_aligned = jnp.einsum("bni,bij->bnj", x, rot)
    msd = jnp.mean(jnp.sum((x_aligned - r[None]) ** 2, axis=-1), axis=-1)
    return jnp.sqrt(msd)
