"""Synthetic CG systems with exactly known torsion distributions.

Positive controls for the train -> sample -> evaluate stack: a 5-bead
"dipeptide" whose internal coordinates are drawn from specified
distributions — narrow Gaussians for bonds/angles and a von Mises mixture
for the two backbone torsions (phi, psi). Because the generative
distribution is known in closed form, a trained diffusion model can be held
to an absolute accuracy bar (dihedral JS vs. the generator), which real
protein datasets cannot provide without the reference's DESRES trajectories
(absent from this image; see docs/STATUS_ROUND1.md).

The 5-bead layout matches the ala2 CG model (reference
evaluate/evaluators_CGflowmatching.py:32-38: phi = beads 0-3, psi = beads
1-4), so the standard :class:`DihedralEnergiesEvaluator` applies unchanged.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

# (weight, mean, concentration) von Mises mixture components. Four-basin
# Ramachandran-like landscape: each torsion is bimodal, jointly 4 modes.
PHI_COMPONENTS: Tuple[Tuple[float, float, float], ...] = (
    (0.65, -1.2, 8.0),
    (0.35, 1.1, 8.0),
)
PSI_COMPONENTS: Tuple[Tuple[float, float, float], ...] = (
    (0.5, -2.0, 6.0),
    (0.5, 0.6, 6.0),
)

BOND_LENGTH = 1.53  # Angstrom-ish; the physics is scale-free
BOND_STD = 0.02
ANGLE = 1.937  # ~111 degrees
ANGLE_STD = 0.04


def sample_torsion_mixture(
    rng: np.random.Generator,
    n: int,
    components: Sequence[Tuple[float, float, float]],
) -> np.ndarray:
    """Draw ``n`` angles from a von Mises mixture; wrapped to [-pi, pi]."""
    weights = np.array([c[0] for c in components], dtype=np.float64)
    weights = weights / weights.sum()
    which = rng.choice(len(components), size=n, p=weights)
    out = np.empty(n, dtype=np.float64)
    for i, (_, mu, kappa) in enumerate(components):
        m = which == i
        out[m] = rng.vonmises(mu, kappa, size=int(m.sum()))
    return out


def _nerf_extend(a, b, c, bond, angle, torsion):
    """Place the next atom D from the three previous (vectorized NeRF).

    D sits at distance ``bond`` from C, with angle(B, C, D) = ``angle`` and
    dihedral(A, B, C, D) = ``torsion`` under the mdtraj sign convention
    (ops/geometry.py:96-104).
    """
    bc = c - b
    bc = bc / np.linalg.norm(bc, axis=-1, keepdims=True)
    ab = b - a
    n = np.cross(ab, bc)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    m = np.cross(n, bc)
    d_local = np.stack(
        [
            -np.cos(angle),
            np.sin(angle) * np.cos(torsion),
            np.sin(angle) * np.sin(torsion),
        ],
        axis=-1,
    )
    frame = np.stack([bc, m, n], axis=-2)  # rows are the local basis
    return c + bond[..., None] * np.einsum("...i,...ij->...j", d_local, frame)


def build_chain(bonds: np.ndarray, angles: np.ndarray, torsions: np.ndarray) -> np.ndarray:
    """Internal -> Cartesian for a 5-bead chain.

    bonds: (B, 4), angles: (B, 3), torsions: (B, 2) -> coords (B, 5, 3).
    """
    b = bonds.shape[0]
    p0 = np.zeros((b, 3))
    p1 = p0 + np.stack([bonds[:, 0], np.zeros(b), np.zeros(b)], axis=-1)
    # third bead in the xy-plane at the prescribed angle
    p2 = p1 + bonds[:, 1, None] * np.stack(
        [-np.cos(angles[:, 0]), np.sin(angles[:, 0]), np.zeros(b)], axis=-1
    )
    p3 = _nerf_extend(p0, p1, p2, bonds[:, 2], angles[:, 1], torsions[:, 0])
    p4 = _nerf_extend(p1, p2, p3, bonds[:, 3], angles[:, 2], torsions[:, 1])
    return np.stack([p0, p1, p2, p3, p4], axis=1)


def bimodal_dipeptide_dataset(
    n_samples: int,
    seed: int = 0,
    phi_components=PHI_COMPONENTS,
    psi_components=PSI_COMPONENTS,
) -> np.ndarray:
    """(n_samples, 5, 3) float32, mean-centered, random SO(3) orientation.

    phi/psi follow the given von Mises mixtures exactly; bonds and bending
    angles are narrow Gaussians around equilibrium.
    """
    rng = np.random.default_rng(seed)
    bonds = rng.normal(BOND_LENGTH, BOND_STD, size=(n_samples, 4))
    angles = rng.normal(ANGLE, ANGLE_STD, size=(n_samples, 3))
    torsions = np.stack(
        [
            sample_torsion_mixture(rng, n_samples, phi_components),
            sample_torsion_mixture(rng, n_samples, psi_components),
        ],
        axis=-1,
    )
    coords = build_chain(bonds, angles, torsions)
    coords = coords - coords.mean(axis=1, keepdims=True)
    # random global rotation per frame (the model is trained with SO(3)
    # augmentation; the data itself should not carry a preferred frame)
    q = rng.normal(size=(n_samples, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    rot = np.stack(
        [
            np.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2)], -1),
        ],
        axis=-2,
    )
    coords = np.einsum("bij,bnj->bni", rot, coords)
    return coords.astype(np.float32)
