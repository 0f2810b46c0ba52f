import numpy as np
import pytest

from twoforone_tpu.evaluate.kinetics import (
    assign_clusters,
    kmeans_centers,
    transition_count_matrix,
    transition_probability_matrix,
)
from twoforone_tpu.utils.config import TrainConfig, load_legacy_args_pickle
from twoforone_tpu.utils.equivariance import (
    check_reflection_equivariance,
    check_rotation_equivariance,
    check_translation_invariance,
)


def test_assign_clusters():
    centers = np.array([[0.0, 0.0], [10.0, 10.0]])
    tics = np.array([[0.1, -0.2], [9.5, 10.2], [1.0, 1.0]])
    np.testing.assert_array_equal(assign_clusters(tics, centers), [0, 1, 0])


def test_kmeans_and_transitions():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 2)) * 0.2
    b = rng.normal(size=(500, 2)) * 0.2 + 5.0
    tics = np.concatenate([a, b])
    centers = kmeans_centers(tics, 2, seed=0)
    assert centers.shape == (2, 2)
    # trajectory oscillating between two known states
    labels = np.array([0, 0, 0, 1, 1, 1, 0, 0, 1])
    counts = transition_count_matrix(labels, 2, lagtime=1)
    assert counts.sum() == len(labels) - 1
    assert counts[0, 0] == 3 and counts[0, 1] == 2 and counts[1, 1] == 2
    p = transition_probability_matrix(counts)
    np.testing.assert_allclose(p.sum(axis=1), [1.0, 1.0])


def test_transition_counts_multi_chain_and_lag():
    labels = np.array([[0, 1, 0, 1], [1, 1, 1, 1]])
    counts = transition_count_matrix(labels, 2, lagtime=2)
    # chain0 pairs: (0,0),(1,1); chain1: (1,1),(1,1)
    assert counts[0, 0] == 1 and counts[1, 1] == 3


def test_equivariance_checkers_on_symmetric_model():
    """The production config (intrinsic coords, conservative) is exactly
    reflection/rotation-equivariant and translation-invariant; the abs-coords
    path is not. The checkers must expose that difference."""
    import jax

    from twoforone_tpu.models.graph_transformer import GraphTransformer, make_score_fn

    def build(intrinsic, abs_coords):
        m = GraphTransformer(
            num_beads=5, hidden_nf=16, n_layers=1,
            use_intrinsic_coords=intrinsic, use_abs_coords=abs_coords,
            use_distances=not intrinsic, conservative=True,
        )
        x = np.zeros((1, 5, 3), np.float32)
        p = m.init(jax.random.PRNGKey(0), x, np.zeros(1, np.float32),
                   return_energy=True)["params"]
        return make_score_fn(m, p)

    fn = build(intrinsic=True, abs_coords=False)
    assert check_translation_invariance(fn, 5, batch=16) < 1e-5
    rot_gap = check_rotation_equivariance(fn, 5, batch=16)
    # intrinsic-coord edges are NOT rotation-invariant features, so the raw
    # graph transformer is not exactly equivariant; gap must be finite
    assert np.isfinite(rot_gap)
    inv_gap, eq_gap = check_reflection_equivariance(fn, 5, batch=16)
    assert np.isfinite(inv_gap) and np.isfinite(eq_gap)

    # distances-only edges ARE E(3)-invariant -> conservative forces exactly
    # rotation-equivariant
    fn_dist = build(intrinsic=False, abs_coords=False)
    assert check_rotation_equivariance(fn_dist, 5, batch=16) < 1e-4
    _, eq_gap_dist = check_reflection_equivariance(fn_dist, 5, batch=16)
    assert eq_gap_dist < 1e-4


def test_config_roundtrip(tmp_path):
    cfg = TrainConfig(mol="chignolin", hidden_features_gnn=64, langevin_t_diff=[15, 20])
    path = str(tmp_path / "config.json")
    cfg.to_json(path)
    cfg2 = TrainConfig.from_json(path)
    assert cfg2.mol == "chignolin"
    assert cfg2.langevin_t_diff == [15, 20]
    assert cfg2.shuffle_data_before_splitting is True  # derived for fast folders


def test_config_tolerates_unknown_keys():
    cfg = TrainConfig.from_dict(
        {"mol": "chignolin", "energy_prior": "NO_PRIOR", "hidden_size": 160}
    )
    assert cfg.mol == "chignolin"
    assert cfg.extra == {"energy_prior": "NO_PRIOR", "hidden_size": 160}


def test_load_legacy_args_pickle():
    """Shipped reference args.pickle files (with torch objects + legacy keys)
    must convert cleanly."""
    import os

    path = "/root/reference/saved_models/chignolin/args.pickle"
    if not os.path.exists(path):
        pytest.skip("reference args.pickle not available")
    cfg = load_legacy_args_pickle(path)
    assert cfg.mol == "CHIGNOLIN"
    assert cfg.hidden_features_gnn == 64
    assert cfg.num_layers_gnn == 3
    assert cfg.loss_weights == "higheruntil_100"
    assert cfg.use_intrinsic_coords is True
    assert cfg.use_abs_coords is False
    assert cfg.conservative is True
    assert cfg.extra.get("energy_prior") == "NO_PRIOR"
