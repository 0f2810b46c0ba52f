import numpy as np
import jax.numpy as jnp
import pytest

from twoforone_tpu.dynamics.integrators import LangevinSimulation


def harmonic_force(k=1.0):
    """F = -k x; (potential, forces) signature."""

    def fn(x):
        return 0.5 * k * jnp.sum(x**2, axis=(1, 2)), -k * x

    return fn


def _init(n_sims=32, n_beads=4):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_sims, n_beads, 3)).astype(np.float32)
    return x - x.mean(axis=1, keepdims=True)


def test_overdamped_equilibrium_variance():
    """Brownian dynamics in a harmonic well must equilibrate at var = 1/(k beta)
    (projected onto the zero-CoM subspace: var * (N-1)/N per bead coord)."""
    k, beta, n_beads = 2.0, 4.0, 4
    sim = LangevinSimulation(
        force_fn=harmonic_force(k),
        initial_coordinates=_init(256, n_beads),
        dt=0.01,
        beta=beta,
        friction=None,
        length=4000,
        save_interval=40,
        random_seed=1,
    )
    traj = sim.simulate()
    assert traj.shape == (256, 100, n_beads, 3)
    samples = traj[:, 50:]  # discard burn-in
    var = samples.var()
    expected = (1.0 / (k * beta)) * (n_beads - 1) / n_beads
    assert var == pytest.approx(expected, rel=0.1)


def test_baoab_equilibrium_variance_and_kinetic_energy():
    k, beta, n_beads, mass = 1.0, 2.0, 4, 2.0
    sim = LangevinSimulation(
        force_fn=harmonic_force(k),
        initial_coordinates=_init(256, n_beads),
        dt=0.05,
        beta=beta,
        friction=1.0,
        masses=[mass] * n_beads,
        length=8000,
        save_interval=80,
        random_seed=2,
    )
    traj = sim.simulate()
    samples = traj[:, 50:]
    expected = (1.0 / (k * beta)) * (n_beads - 1) / n_beads
    assert samples.var() == pytest.approx(expected, rel=0.15)
    # equipartition: <KE> = (3 N / 2) kT with the BAOAB half-step velocity
    kes = sim.kinetic_energies[:, 50:]
    expected_ke = 1.5 * n_beads / beta
    assert kes.mean() == pytest.approx(expected_ke, rel=0.2)


def test_chunking_is_invisible():
    """Same seed, different host-offload chunk sizes -> identical trajectory."""
    kwargs = dict(
        force_fn=harmonic_force(),
        initial_coordinates=_init(8),
        dt=0.01,
        beta=1.0,
        friction=None,
        length=400,
        save_interval=20,
        random_seed=3,
    )
    t1 = LangevinSimulation(steps_per_chunk=400, **kwargs).simulate()
    t2 = LangevinSimulation(steps_per_chunk=40, **kwargs).simulate()
    np.testing.assert_array_equal(t1, t2)


def test_auto_chunk_walltime_calibration():
    """Auto chunking probes per-step cost and sizes dispatches to the
    wall-time budget without changing the trajectory (the RPC-deadline
    guard for tunneled TPU runtimes)."""
    kwargs = dict(
        force_fn=harmonic_force(),
        initial_coordinates=_init(8),
        dt=0.01,
        beta=1.0,
        friction=None,
        length=400,
        save_interval=20,
        random_seed=3,
    )
    ref = LangevinSimulation(steps_per_chunk=400, **kwargs).simulate()
    # Zero budget -> after the probe calibrates, every chunk collapses to
    # one save period (the minimum dispatch).
    sim = LangevinSimulation(target_chunk_seconds=1e-9, **kwargs)
    out = sim.simulate()
    np.testing.assert_array_equal(out, ref)
    assert sim._per_step_s is not None and sim._per_step_s > 0
    assert 1 in sim._seen_chunk_sizes  # budget clamped chunks to 1 save period
    # A second simulate() on a fresh-but-calibrated sim skips the probe:
    # only the budget-sized chunk (and a final partial) are dispatched.
    sim2 = LangevinSimulation(target_chunk_seconds=1e-9, **kwargs)
    sim2._per_step_s = sim._per_step_s
    out2 = sim2.simulate()
    np.testing.assert_array_equal(out2, ref)
    assert sim2._seen_chunk_sizes == {1}


def test_resume_matches_single_run():
    """Two simulate(sub_interval) calls == one simulate() call state-wise."""
    kwargs = dict(
        force_fn=harmonic_force(),
        initial_coordinates=_init(4),
        dt=0.01,
        beta=1.0,
        friction=1.0,
        masses=[1.0] * 4,
        length=200,
        save_interval=10,
        random_seed=4,
    )
    s1 = LangevinSimulation(**kwargs)
    s1.simulate()
    end1 = s1.state

    s2 = LangevinSimulation(**kwargs)
    s2.simulate(sub_interval=100)
    s2.simulate(sub_interval=100)
    end2 = s2.state
    assert end1["t"] == end2["t"] == 200
    # Per-period RNG keys derive from the global step index, so a split run is
    # bitwise identical to a single run.
    np.testing.assert_array_equal(end1["x"], end2["x"])
    s3 = LangevinSimulation(**kwargs)
    s3.load_state(end1)
    assert s3.state["t"] == 200
    np.testing.assert_array_equal(s3.state["x"], end1["x"])


def test_option_validation():
    x = _init(2)
    f = harmonic_force()
    with pytest.raises(ValueError, match="save_interval must be a factor"):
        LangevinSimulation(f, x, length=101, save_interval=10)
    with pytest.raises(RuntimeError, match="masses must be given"):
        LangevinSimulation(f, x, friction=1.0, length=100, save_interval=10)
    with pytest.raises(ValueError, match="mass list length"):
        LangevinSimulation(f, x, friction=1.0, masses=[1.0] * 3, length=100, save_interval=10)
    with pytest.raises(ValueError, match="log_type"):
        LangevinSimulation(f, x, length=100, save_interval=10, log_type="nope")
    with pytest.raises(RuntimeError, match="filename"):
        LangevinSimulation(f, x, length=100, save_interval=10, export_interval=10)


def test_export_and_overwrite_guard(tmp_path):
    x = _init(2)
    f = harmonic_force()
    base = str(tmp_path / "run")
    sim = LangevinSimulation(
        f, x, length=100, save_interval=10, export_interval=50,
        filename=base, random_seed=5,
    )
    sim.simulate()
    import os

    assert os.path.exists(base + "_coords_000.npy")
    assert os.path.exists(base + "_coords_001.npy")
    arr = np.load(base + "_coords_000.npy")
    assert arr.shape == (2, 5, 4, 3)
    # refuses to overwrite
    with pytest.raises(ValueError, match="already exists"):
        LangevinSimulation(
            f, x, length=100, save_interval=10, export_interval=50, filename=base
        )


def test_tempering_ramp_runs():
    sim = LangevinSimulation(
        force_fn=harmonic_force(),
        initial_coordinates=_init(4),
        dt=0.01,
        beta=2.0,
        friction=None,
        length=100,
        save_interval=10,
        random_seed=6,
    )
    traj = sim.simulate(reference_beta=1.0)
    assert traj.shape == (4, 10, 4, 3)
    assert np.all(np.isfinite(traj))


def test_save_forces_and_potential():
    sim = LangevinSimulation(
        force_fn=harmonic_force(3.0),
        initial_coordinates=_init(4),
        dt=0.01,
        beta=1.0,
        friction=None,
        length=50,
        save_interval=10,
        save_forces=True,
        save_potential=True,
        random_seed=7,
    )
    traj = sim.simulate()
    # saved forces are -k * (pre-step coords); check shape/finite + magnitudes
    assert sim.simulated_forces.shape == traj.shape
    assert sim.simulated_potential.shape == (4, 5)
    assert np.all(np.isfinite(sim.simulated_forces))


def test_restraint_and_force_clipping():
    """Framework extensions: harmonic tether bounds a repulsive field; force
    clipping caps spikes."""
    def repulsive(x):
        return jnp.zeros(x.shape[0]), 5.0 * x  # unbounded-below potential

    x0 = _init(8)
    sim = LangevinSimulation(
        force_fn=repulsive, initial_coordinates=x0, dt=0.01, beta=1.0,
        friction=None, length=2000, save_interval=100, random_seed=0,
        restraint_k=10.0, max_force=50.0,
    )
    traj = sim.simulate()
    assert np.all(np.isfinite(traj))
    # net force -5x: equilibrium var = 1/(5 beta) * (N-1)/N per coord
    var = traj[:, 10:].var()
    assert var == pytest.approx(0.2 * 3 / 4, rel=0.2)


def test_tempering_ramp_temperature_profile():
    """The ramp actually changes the sampled temperature: with a HOT
    reference_beta and a COLD simulation beta, the hold-at-sim-beta quarter
    has the cold equilibrium variance and the final hold-at-reference
    quarter the hot one (profile: ramp ref->sim over q, hold sim, ramp back,
    hold ref — reference langevin_cgnet.py:724-735)."""
    k, beta_sim, beta_ref, n_beads = 2.0, 4.0, 0.5, 4
    sim = LangevinSimulation(
        force_fn=harmonic_force(k),
        initial_coordinates=_init(512, n_beads),
        dt=0.01,
        beta=beta_sim,
        friction=None,
        length=8000,
        save_interval=40,
        random_seed=7,
    )
    traj = sim.simulate(reference_beta=beta_ref)  # (512, 200, 4, 3)
    geom = (n_beads - 1) / n_beads
    cold = traj[:, 60:100].var()   # second quarter: hold at beta_sim
    hot = traj[:, 170:].var()      # last quarter: hold at beta_ref
    assert cold == pytest.approx(1.0 / (k * beta_sim) * geom, rel=0.12)
    assert hot == pytest.approx(1.0 / (k * beta_ref) * geom, rel=0.12)
