"""Generic MD-trajectory dataset with optional bond-graph items.

Capability-parity redesign of the reference's ``MDTrajectory``
(datasets/dataset_utils_empty.py:264-381): a frame-indexable dataset over a
trajectory with optional Kabsch alignment to frame 0, per-item transforms,
extra per-frame features, and a "graph mode" (``return_bond_graph=True``)
that yields each frame as a graph. Where the reference wraps frames in
``torch_geometric.data.Data(pos, atom_labels, edge_index)`` (:355-358), this
framework returns a plain :class:`GraphFrame` NamedTuple of numpy arrays —
directly feedable to jnp / jraph-style models without a torch_geometric
dependency.

Bonds: the reference reads ``traj.topology.bonds`` from mdtraj. This
framework's PDB parser keeps no bond table, so bonds are taken from an
explicit ``bonds`` argument when given, else inferred as the sequential
backbone of each chain — exact for the CG bead chains this codebase models
(every shipped molecule is a linear CA trace).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import numpy as np

from twoforone_tpu.data.pdb import Topology

# Atomic numbers for the elements that occur in the shipped CG/atomistic PDBs.
_ATOMIC_NUMBERS = {
    "H": 1, "C": 6, "N": 7, "O": 8, "F": 9, "NA": 11, "MG": 12, "P": 15,
    "S": 16, "CL": 17, "K": 19, "CA": 20, "FE": 26, "ZN": 30, "BR": 35,
    "I": 53,
}


class GraphFrame(NamedTuple):
    """One trajectory frame as a graph (the torch_geometric ``Data`` fields
    the reference populates, dataset_utils_empty.py:355-358)."""

    pos: np.ndarray  # (N, 3) float32
    atom_labels: np.ndarray  # (N,) int32, atomic_number - 1 (reference :351)
    edge_index: np.ndarray  # (2, E) int32


def backbone_bonds(topology: Topology) -> np.ndarray:
    """(E, 2) consecutive-bead bonds within each chain."""
    pairs = []
    atoms = topology.atoms
    for i in range(len(atoms) - 1):
        if atoms[i].chain == atoms[i + 1].chain:
            pairs.append((i, i + 1))
    return np.asarray(pairs, dtype=np.int32).reshape(-1, 2)


def _atom_labels(topology: Topology) -> np.ndarray:
    labels = []
    for a in topology.atoms:
        el = (a.element or a.name[:1]).upper()
        z = _ATOMIC_NUMBERS.get(el, _ATOMIC_NUMBERS.get(el[:1], 6))
        labels.append(z - 1)
    return np.asarray(labels, dtype=np.int32)


class MDTrajectoryDataset:
    """Frame dataset over an MD trajectory (reference MDTrajectory parity).

    Args:
      xyz: (n_frames, n_atoms, 3) coordinates.
      topology: the molecule's topology.
      extra_features: optional per-frame features, same length as the
        trajectory (reference :326-329).
      transform: applied to the coordinates of each returned item
        (reference :360-363).
      return_bond_graph: yield :class:`GraphFrame` items instead of raw
        coordinate arrays (reference :353-358).
      timestep: frame spacing in picoseconds (reference TemporalSequence).
      align: Kabsch-superpose every frame onto frame 0 before serving
        (reference :320-321).
      bonds: explicit (E, 2) bond list; default = sequential backbone.
    """

    def __init__(
        self,
        xyz: np.ndarray,
        topology: Topology,
        extra_features: Optional[Sequence] = None,
        transform: Optional[Callable] = None,
        return_bond_graph: bool = False,
        timestep: Optional[float] = None,
        align: bool = False,
        bonds: Optional[np.ndarray] = None,
    ):
        xyz = np.asarray(xyz, dtype=np.float32)
        if align and len(xyz) > 0:
            from twoforone_tpu.ops.geometry import superpose

            xyz = np.asarray(superpose(xyz, xyz[0]), dtype=np.float32)
        self.xyz = xyz
        self.topology = topology
        if extra_features is not None:
            assert len(extra_features) == len(xyz), (
                "The extra features must have the same length as the trajectory"
            )
        self.extra_features = extra_features
        self.transform = transform
        self.return_bond_graph = return_bond_graph
        self.timestep = timestep
        if return_bond_graph:
            b = backbone_bonds(topology) if bonds is None else np.asarray(bonds)
            self.edge_index = b.T.astype(np.int32)  # (2, E), reference :338-343
            self.atom_labels = _atom_labels(topology)

    def __len__(self) -> int:
        return len(self.xyz)

    def __getitem__(self, idx):
        x = self.xyz[idx]
        if self.transform is not None:
            x = self.transform(x)
        if self.return_bond_graph:
            item = GraphFrame(
                pos=np.asarray(x, np.float32),
                atom_labels=self.atom_labels,
                edge_index=self.edge_index,
            )
        else:
            item = x
        if self.extra_features is not None:
            return item, self.extra_features[idx]
        return item
