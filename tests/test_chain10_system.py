"""The synthetic 10-bead (chignolin-scale) control system: generator and
TICA scorer machinery (fast lane; the trained control itself runs at
production scale via scripts/chain10_control.py)."""

import numpy as np

from twoforone_tpu.data.synthetic import (
    CHAIN10_TORSION_COMPONENTS,
    build_chain_n,
    chain10_dataset,
    chain10_trajectory,
)
from twoforone_tpu.train.positive_control import SyntheticTicScorer


def test_build_chain_n_generalizes_build_chain():
    """N=5 case of the generalized builder must equal the original ala2
    builder (the positive-control geometry contract)."""
    from twoforone_tpu.data.synthetic import build_chain

    rng = np.random.default_rng(0)
    bonds = rng.normal(1.5, 0.02, size=(32, 4))
    angles = rng.normal(1.9, 0.04, size=(32, 3))
    torsions = rng.uniform(-np.pi, np.pi, size=(32, 2))
    np.testing.assert_allclose(
        build_chain_n(bonds, angles, torsions),
        build_chain(bonds, angles, torsions),
        atol=1e-12,
    )


def test_chain10_torsion_distribution_exact():
    """i.i.d. draws and the Metropolis trajectory must share the equilibrium
    torsion distribution (the walk's stationarity is what makes the known
    answer usable as an absolute accuracy bar)."""
    from twoforone_tpu.evaluate.evaluators import sliding_dihedral_indices
    from twoforone_tpu.evaluate.metrics import js_divergence
    from twoforone_tpu.ops.geometry import dihedrals

    iid = chain10_dataset(20000, seed=0)
    traj = chain10_trajectory(20000, seed=1, walkers=40)
    ind = sliding_dihedral_indices(10)
    d_iid = np.asarray(dihedrals(iid, ind))
    d_traj = np.asarray(dihedrals(traj, ind))
    assert d_iid.shape == (20000, 7)
    for k in range(7):
        h1 = np.histogram(d_iid[:, k], bins=61, range=(-np.pi, np.pi))[0]
        h2 = np.histogram(d_traj[:, k], bins=61, range=(-np.pi, np.pi))[0]
        assert js_divergence(h1, h2) < 0.02, f"torsion {k}"


def test_chain10_trajectory_has_slow_modes():
    """The Metropolis walk must be time-correlated at the TICA lagtime
    (otherwise TICA fitting is degenerate and the control proves nothing)."""
    traj = chain10_trajectory(30000, seed=2, walkers=10)
    from twoforone_tpu.evaluate.evaluators import sliding_dihedral_indices
    from twoforone_tpu.ops.geometry import dihedrals

    d = np.asarray(dihedrals(traj, sliding_dihedral_indices(10)))
    # slow torsion (index 2, bimodal): sin should autocorrelate at lag 100
    s = np.sin(d[:3000, 2])  # within one walker's segment
    ac = np.corrcoef(s[:-100], s[100:])[0, 1]
    assert ac > 0.3, ac


def test_chain20_components_fixture():
    """The N=20 control's torsion system is a deterministic fixture with
    exactly the documented number of bimodal slow modes."""
    from twoforone_tpu.data.synthetic import make_chain_components

    comps = make_chain_components(17, n_slow=4, seed=11)
    assert len(comps) == 17
    assert sum(len(c) == 2 for c in comps) == 4
    # deterministic across calls (it is the ground truth of a control run)
    again = make_chain_components(17, n_slow=4, seed=11)
    assert comps == again
    # mixture weights normalized-ish and modes well separated
    for c in comps:
        if len(c) == 2:
            (w1, m1, _), (w2, m2, _) = c
            assert abs(w1 + w2 - 1.0) < 1e-12
            gap = abs(np.mod(m1 - m2 + np.pi, 2 * np.pi) - np.pi)
            assert gap > 1.5, (m1, m2)


def test_chain20_torsion_distribution_exact():
    """N=20: i.i.d. draws and the Metropolis trajectory share the
    equilibrium torsion distribution (stationarity at the control size)."""
    from twoforone_tpu.data.synthetic import (
        chain_dataset,
        chain_trajectory,
        make_chain_components,
    )
    from twoforone_tpu.evaluate.evaluators import sliding_dihedral_indices
    from twoforone_tpu.evaluate.metrics import js_divergence
    from twoforone_tpu.ops.geometry import dihedrals

    comps = make_chain_components(17, n_slow=4, seed=11)
    iid = chain_dataset(15000, comps, seed=0)
    traj = chain_trajectory(15000, comps, seed=1, walkers=40)
    assert iid.shape == (15000, 20, 3)
    ind = sliding_dihedral_indices(20)
    d_iid = np.asarray(dihedrals(iid, ind))
    d_traj = np.asarray(dihedrals(traj, ind))
    for k in range(17):
        h1 = np.histogram(d_iid[:, k], bins=61, range=(-np.pi, np.pi))[0]
        h2 = np.histogram(d_traj[:, k], bins=61, range=(-np.pi, np.pi))[0]
        assert js_divergence(h1, h2) < 0.03, f"torsion {k}"


def test_synthetic_tic_scorer_discriminates():
    """Floor JS small for an equilibrium redraw; garbage scores high."""
    scorer = SyntheticTicScorer(
        chain10_trajectory(40000, seed=3),
        chain10_dataset(20000, seed=4),
    )
    floor = scorer.tic_js(chain10_dataset(20000, seed=5))
    assert floor < 0.06, floor
    rng = np.random.default_rng(0)
    garbage = rng.normal(size=(20000, 10, 3)).astype(np.float32) * 3.0
    assert scorer.tic_js(garbage) > 5 * floor
