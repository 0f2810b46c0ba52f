import os

import numpy as np
import pytest

from twoforone_tpu.data.datasets import CGDataset, get_dataset
from twoforone_tpu.data.molecules import FOLDED_PDB_DIR, Molecules, norm_stds
from twoforone_tpu.data.pdb import load_pdb, process_pdb, save_pdb

# villin is 35: 33 standard residues + 2 norleucine (NLE) HETATM C-alphas,
# which mdtraj (and therefore the reference's topology.n_residues) includes.
BEAD_COUNTS = {
    "chignolin": 10,
    "trp_cage": 20,
    "bba": 28,
    "villin": 35,
    "protein_g": 56,
}


@pytest.mark.parametrize("mol,n", list(BEAD_COUNTS.items()))
def test_ca_topologies(mol, n):
    path = os.path.join(FOLDED_PDB_DIR, f"{Molecules[mol.upper()].value}-0-c-alpha.pdb")
    s = load_pdb(path)
    assert s.topology.n_atoms == n
    assert s.topology.n_residues == n
    assert s.xyz.shape == (n, 3)


@pytest.mark.parametrize("mol,n", list(BEAD_COUNTS.items()))
def test_process_pdb_full_structures(mol, n):
    path = os.path.join(FOLDED_PDB_DIR, f"{Molecules[mol.upper()].value}.pdb")
    folded = process_pdb(path, mol)
    assert folded.xyz.shape == (n, 3)
    # C-alpha pairwise bond distances ~ 3.8 Angstrom in folded proteins
    d = np.linalg.norm(np.diff(folded.xyz, axis=0), axis=-1)
    assert 2.5 < d.mean() < 4.5


def test_save_load_roundtrip(tmp_path):
    path = os.path.join(FOLDED_PDB_DIR, "CLN025-0-c-alpha.pdb")
    s = load_pdb(path)
    out = str(tmp_path / "out.pdb")
    frames = np.stack([s.xyz, s.xyz + 1.0])
    save_pdb(out, frames, s.topology)
    back = load_pdb(out)
    assert back.topology.n_atoms == s.topology.n_atoms
    np.testing.assert_allclose(back.xyz, s.xyz, atol=1e-3)


def test_empty_dataset_mode():
    train, val, test = get_dataset("chignolin", mean0=True, data_folder=None)
    assert train.is_empty and len(train) == 0
    assert train.num_beads == 10
    assert train.std == pytest.approx(norm_stds[Molecules.CHIGNOLIN])
    assert train.bead_onehot.shape == (10, 10)


def test_empty_ala2_dataset():
    train, _, _ = get_dataset("alanine_dipeptide_fuberlin", mean0=True, fold=2)
    assert train.num_beads == 5
    assert train.std == pytest.approx(norm_stds["alanine_fold2"])


def test_ala2_fold_split(tmp_path):
    # synthetic npz with 4000 frames
    coords = np.random.default_rng(0).normal(size=(4000, 5, 3)).astype(np.float32)
    np.savez(tmp_path / "ala2_cg_2fs_Hmass_2_HBonds.npz", coords=coords)
    train, val, test = get_dataset(
        "alanine_dipeptide_fuberlin", mean0=True, data_folder=str(tmp_path), fold=2
    )
    assert len(test) == 1000
    assert len(train) + len(val) == 3000
    assert len(train) <= 500000
    # test chunk is the second quarter, in order and centered
    np.testing.assert_allclose(test.data.mean(axis=1), 0.0, atol=1e-5)
    expected = coords[1000:2000] - coords[1000:2000].mean(axis=1, keepdims=True)
    np.testing.assert_allclose(test.data, expected, atol=1e-5)


def test_deshaw_npy_loading_and_split(tmp_path):
    # preprocessed npy in nm; loader converts to Angstrom
    coords_nm = np.random.default_rng(1).normal(size=(1000, 10, 3)).astype(np.float32)
    np.save(tmp_path / "CLN025-0-c-alpha.npy", coords_nm)
    train, val, test = get_dataset(
        "chignolin", mean0=True, data_folder=str(tmp_path), shuffle_before_splitting=True
    )
    assert len(train) == 700 and len(val) == 100 and len(test) == 200
    np.testing.assert_allclose(train.data.mean(axis=1), 0.0, atol=1e-4)
    # Angstrom conversion: overall std is 10x the nm std (centering aside)
    assert train.data.std() > 5  # nm std ~1 -> Angstrom ~10

    # fixed-seed shuffle is deterministic
    train2, _, _ = get_dataset(
        "chignolin", mean0=True, data_folder=str(tmp_path), shuffle_before_splitting=True
    )
    np.testing.assert_array_equal(train.data, train2.data)


def test_prepare_shuffle_parity():
    """The fixed-seed shuffle must match the reference's
    np.random.seed(2342361); np.random.shuffle(data)."""
    data = np.arange(20, dtype=np.float32).reshape(10, 1, 2).repeat(3, axis=2) * 0
    data = np.random.default_rng(3).normal(size=(10, 2, 3)).astype(np.float32)
    out = CGDataset.prepare(data.copy(), mean0=False, shuffle=True)
    expected = data.copy()
    np.random.seed(2342361)
    np.random.shuffle(expected)
    np.testing.assert_array_equal(out, expected)


def test_ala2_fold_boundaries_match_torch_chunk(tmp_path):
    """Fold membership must be bit-identical to the reference's torch.chunk
    (dataset_utils_empty.py:93): all chunks ceil(n/4) except a short last,
    NOT np.array_split's pad-the-first-chunks layout. n=4002 makes them
    differ."""
    import torch

    n = 4002
    coords = np.random.default_rng(3).normal(size=(n, 5, 3)).astype(np.float32)
    np.savez(tmp_path / "ala2_cg_2fs_Hmass_2_HBonds.npz", coords=coords)
    ref_chunks = [c.numpy() for c in torch.arange(n).chunk(4)]
    for fold in (1, 2, 3, 4):
        _, _, test = get_dataset(
            "alanine_dipeptide_fuberlin", mean0=True,
            data_folder=str(tmp_path), fold=fold,
        )
        expected_idx = ref_chunks[fold - 1]
        assert len(test) == len(expected_idx)
        expected = coords[expected_idx] - coords[expected_idx].mean(axis=1, keepdims=True)
        np.testing.assert_allclose(test.data, expected, atol=1e-5)


def test_ala2_trainval_split_seeded_and_legacy(tmp_path):
    """Default split is deterministic across processes (seeded permutation —
    a deliberate divergence from the reference's unseeded torch.randperm,
    dataset_utils_empty.py:96); split_seed=None restores legacy behavior."""
    coords = np.random.default_rng(4).normal(size=(400, 5, 3)).astype(np.float32)
    np.savez(tmp_path / "ala2_cg_2fs_Hmass_2_HBonds.npz", coords=coords)
    kw = dict(mean0=True, data_folder=str(tmp_path), fold=1, ala2_train_cap=200)
    t1, v1, _ = get_dataset("alanine_dipeptide_fuberlin", **kw)
    t2, v2, _ = get_dataset("alanine_dipeptide_fuberlin", **kw)
    np.testing.assert_array_equal(t1.data, t2.data)
    np.testing.assert_array_equal(v1.data, v2.data)
    # train/val partition the 300 non-test frames with no overlap
    assert len(t1) == 200 and len(v1) == 100
    # legacy mode shuffles from ambient RNG state (still a valid partition)
    np.random.seed(99)
    t3, v3, _ = get_dataset("alanine_dipeptide_fuberlin", split_seed=None, **kw)
    assert len(t3) == 200 and len(v3) == 100


def test_mdtrajectory_dataset_graph_mode():
    """MDTrajectoryDataset parity with the reference's MDTrajectory
    (dataset_utils_empty.py:264-381): align, transform, extra features, and
    graph items (pos / atom_labels / edge_index) without torch_geometric."""
    from twoforone_tpu.data.trajectory import GraphFrame, MDTrajectoryDataset
    from twoforone_tpu.ops.geometry import kabsch_rmsd

    pdb = load_pdb(os.path.join(FOLDED_PDB_DIR, "CLN025-0-c-alpha.pdb"))
    n = pdb.topology.n_atoms
    rng = np.random.default_rng(0)
    base = pdb.xyz.astype(np.float32)
    # frames: rotated + jittered copies of the folded structure
    frames = []
    for _ in range(6):
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        w, x, y, z = q
        rot = np.array([
            [1 - 2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
            [2*(x*y+w*z), 1 - 2*(x*x+z*z), 2*(y*z-w*x)],
            [2*(x*z-w*y), 2*(y*z+w*x), 1 - 2*(x*x+y*y)],
        ])
        frames.append(base @ rot.T + rng.normal(scale=0.01, size=(n, 3)))
    xyz = np.stack(frames).astype(np.float32)

    # plain mode + transform + extra features
    feats = np.arange(6)
    ds = MDTrajectoryDataset(
        xyz, pdb.topology, extra_features=feats, transform=lambda c: c * 2.0
    )
    item, f = ds[3]
    assert f == 3 and item.shape == (n, 3)
    np.testing.assert_allclose(item, xyz[3] * 2.0)

    # align mode: every frame superposes onto frame 0 (RMSD ~ jitter scale)
    ds_al = MDTrajectoryDataset(xyz, pdb.topology, align=True)
    rms = np.asarray(kabsch_rmsd(ds_al.xyz, ds_al.xyz[0]))
    direct = np.linalg.norm(
        ds_al.xyz - ds_al.xyz[0][None], axis=-1
    ).mean(-1)
    np.testing.assert_allclose(direct[1:], rms[1:], atol=0.02)

    # graph mode: chain backbone bonds, atomic labels (z - 1)
    g = MDTrajectoryDataset(xyz, pdb.topology, return_bond_graph=True)[0]
    assert isinstance(g, GraphFrame)
    assert g.pos.shape == (n, 3)
    assert g.edge_index.shape == (2, n - 1)
    np.testing.assert_array_equal(g.edge_index[0], np.arange(n - 1))
    np.testing.assert_array_equal(g.edge_index[1], np.arange(1, n))
    assert g.atom_labels.shape == (n,)
    assert np.all(g.atom_labels >= 0)


def test_synthetic_chain_torsion_roundtrip():
    """NeRF construction must reproduce prescribed torsions under the mdtraj
    sign convention, and the mixture sampler must hit its basin weights."""
    from twoforone_tpu.data.synthetic import (
        bimodal_dipeptide_dataset,
        build_chain,
        sample_torsion_mixture,
    )
    from twoforone_tpu.evaluate.metrics import get_torsions

    b = np.full((4, 4), 1.53)
    a = np.full((4, 3), 1.937)
    tors = np.array([[-1.2, -2.0], [1.1, 0.6], [2.5, -0.3], [0.0, 3.0]])
    rec = get_torsions(build_chain(b, a, tors))
    np.testing.assert_allclose(rec, tors, atol=1e-5)

    rng = np.random.default_rng(0)
    comps = ((0.7, -1.0, 50.0), (0.3, 1.5, 50.0))
    t = sample_torsion_mixture(rng, 20000, comps)
    w = (t > 0.25).mean()  # kappa=50 -> basins well separated
    assert abs(w - 0.3) < 0.02

    data = bimodal_dipeptide_dataset(512, seed=1)
    assert data.shape == (512, 5, 3) and data.dtype == np.float32
    np.testing.assert_allclose(data.mean(axis=1), 0.0, atol=1e-5)
