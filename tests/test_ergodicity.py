"""Ergodicity analysis (evaluate/ergodicity.py): the basin-exchange signal
the stationary physics bars cannot provide (iid-initialized chains give a
perfect stationary histogram even when every chain is frozen in place)."""

import numpy as np
import pytest

from twoforone_tpu.data.synthetic import (
    _chain_frames,
    metropolis_torsion_walk,
)
from twoforone_tpu.evaluate.ergodicity import (
    basin_labels,
    hop_statistics,
    slow_torsion_ergodicity,
)

BIMODAL = ((0.6, -1.2, 8.0), (0.4, 1.4, 8.0))
UNIMODAL = ((1.0, 0.8, 10.0),)


def test_basin_labels_assign_to_nearest_mode():
    theta = np.array([-1.2, 1.4, -1.0, 1.2])
    assert basin_labels(theta, BIMODAL).tolist() == [0, 1, 0, 1]


def test_basin_labels_respect_weights_at_midpoint():
    # Exactly between two equal-kappa modes, the heavier component wins.
    mid = (-1.2 + 1.4) / 2
    assert basin_labels(np.array([mid]), BIMODAL)[0] == 0


def test_hop_statistics_frozen_vs_alternating():
    frozen = np.zeros((8, 100), dtype=int)
    frozen[4:] = 1  # half the chains in the other basin, but nobody moves
    s = hop_statistics(frozen)
    assert s["hop_fraction"] == 0.0 and s["hops_per_frame"] == 0.0

    alternating = np.tile([0, 1], 50)[None, :].repeat(8, axis=0)
    s = hop_statistics(alternating)
    assert s["hop_fraction"] == 1.0
    assert s["hops_per_frame"] == 1.0


def _frames_from_torsions(torsions_cf):
    """(chains, frames, k) torsions -> (chains, frames, k+3, 3) coords."""
    chains, frames, k = torsions_cf.shape
    rng = np.random.default_rng(3)
    flat = _chain_frames(rng, torsions_cf.reshape(chains * frames, k))
    return flat.reshape(chains, frames, k + 3, 3)


def test_frozen_chains_fail_ergodicity_despite_correct_occupancy():
    components = [UNIMODAL, BIMODAL, UNIMODAL]
    rng = np.random.default_rng(0)
    chains, frames = 20, 60
    # Slow torsion pinned per chain: 60% of chains at mode 0, 40% at mode 1
    # -> pooled occupancy matches the generator weights exactly, yet no
    # chain ever crosses. The stationary bars pass; ergodicity must not.
    slow = np.where(np.arange(chains) < 12, -1.2, 1.4)[:, None].repeat(frames, 1)
    slow = slow + 0.05 * rng.normal(size=slow.shape)  # intra-basin jitter
    fast0 = rng.vonmises(0.8, 10.0, size=(chains, frames))
    fast1 = rng.vonmises(0.8, 10.0, size=(chains, frames))
    traj = _frames_from_torsions(np.stack([fast0, slow, fast1], axis=-1))

    erg = slow_torsion_ergodicity(traj, components)
    assert list(erg["per_torsion"].keys()) == [1]  # only the bimodal torsion
    assert erg["min_hop_fraction"] == 0.0
    assert not erg["ergodic"]
    assert erg["max_occupancy_error"] < 0.05  # occupancy alone looks healthy


def test_metropolis_chains_are_ergodic():
    components = [UNIMODAL, BIMODAL, UNIMODAL]
    rng = np.random.default_rng(1)
    chains, frames = 16, 400
    slow = metropolis_torsion_walk(rng, frames, BIMODAL, sigma=1.2, walkers=chains)
    fast0 = rng.vonmises(0.8, 10.0, size=(chains, frames))
    fast1 = rng.vonmises(0.8, 10.0, size=(chains, frames))
    traj = _frames_from_torsions(np.stack([fast0, slow, fast1], axis=-1))

    erg = slow_torsion_ergodicity(traj, components)
    assert erg["ergodic"]
    assert erg["min_hop_fraction"] > 0.9  # sigma=1.2 hops readily
    assert erg["max_occupancy_error"] < 0.1


def test_all_unimodal_system_is_trivially_ergodic():
    traj = _frames_from_torsions(
        np.random.default_rng(2).vonmises(0.8, 10.0, size=(4, 10, 2))
    )
    erg = slow_torsion_ergodicity(traj, [UNIMODAL, UNIMODAL])
    assert erg["ergodic"] and erg["per_torsion"] == {}


def test_shape_validation():
    with pytest.raises(ValueError):
        slow_torsion_ergodicity(np.zeros((10, 5, 3)), [BIMODAL])
    with pytest.raises(ValueError):
        hop_statistics(np.zeros(10, dtype=int))


@pytest.mark.parametrize(
    "name", ["chain10", "chain20", "chain28", "chain35", "chain56", "ala5"]
)
def test_staged_artifact_langevin_ergodic_when_recorded(name):
    """Staged controls that recorded the basin-exchange report must be
    ergodic: every slow torsion crossed by a nontrivial fraction of chains.
    Older artifacts without the fields skip (the report is additive)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "twoforone_tpu", "assets", "trained", name, "results.json",
    )
    if not os.path.exists(path):
        pytest.skip(f"no staged {name}")
    with open(path) as f:
        r = json.load(f)
    if "langevin_min_hop_fraction" not in r:
        pytest.skip(f"{name} predates the ergodicity report")
    # Exactly the staging-gate contract (train/positive_control.py
    # ergodicity_bars_ok): thresholds pinned at the measured-green levels
    # of the staged artifacts (chain35: hop 0.153 / occ 0.072; chain56:
    # 0.146 / 0.069), not the vacuous > 0 of the report's own `ergodic`.
    from twoforone_tpu.train.positive_control import ergodicity_bars_ok

    assert r["langevin_ergodic"], r
    assert r["langevin_min_hop_fraction"] >= 0.10, r
    assert r["langevin_max_occupancy_error"] <= 0.10, r
    assert ergodicity_bars_ok(r), r
