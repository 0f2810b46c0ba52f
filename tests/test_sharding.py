"""Multi-device (8 virtual CPU) sharding tests: data-parallel training step,
sharded sampling, sharded Langevin chains, and the driver dry-run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.models.graph_transformer import GraphTransformer
from twoforone_tpu.parallel.mesh import get_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return get_mesh()


def _tiny_gd(timesteps=50):
    model = GraphTransformer(
        num_beads=10, hidden_nf=16, n_layers=1,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True,
    )
    return GaussianDiffusion(
        model=model, num_atoms=10, timesteps=timesteps,
        norm_factor=3.11, loss_weights="ones",
    )


def test_sharded_loss_matches_single_device(mesh):
    gd = _tiny_gd(timesteps=1000)
    params = gd.init_params(jax.random.PRNGKey(0))
    batch = np.random.default_rng(0).normal(size=(16, 10, 3)).astype(np.float32) * 3.11
    key = jax.random.PRNGKey(1)

    loss_fn = jax.jit(lambda p, b, k: gd.loss(p, b, k)[0])
    loss_single = float(loss_fn(params, jnp.asarray(batch), key))

    params_r = replicate(params, mesh)
    batch_s = shard_batch(jnp.asarray(batch), mesh)
    loss_sharded = float(loss_fn(params_r, batch_s, key))
    assert loss_sharded == pytest.approx(loss_single, rel=1e-5)


def test_sharded_grads_match_single_device(mesh):
    gd = _tiny_gd(timesteps=1000)
    params = gd.init_params(jax.random.PRNGKey(0))
    batch = np.random.default_rng(1).normal(size=(16, 10, 3)).astype(np.float32) * 3.11
    key = jax.random.PRNGKey(2)

    grad_fn = jax.jit(jax.grad(lambda p, b, k: gd.loss(p, b, k)[0]))
    g1 = grad_fn(params, jnp.asarray(batch), key)
    g2 = grad_fn(replicate(params, mesh), shard_batch(jnp.asarray(batch), mesh), key)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_sampling_public_api(mesh):
    """gd.sample(mesh=...) must actually distribute the batch axis (device
    placement asserted, not just finiteness) and agree with the unsharded
    chain (same threefry stream — partitionable RNG; differences are only
    float32 reassociation noise)."""
    gd = _tiny_gd(timesteps=20)
    params = gd.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    ref = np.asarray(gd.make_sample_fn(16)(params, key))
    fn = gd.make_sample_fn(16, mesh=mesh)
    out = fn(replicate(params, mesh), key)

    # real distribution: output lives on all 8 devices, 2 chains per device
    assert len(out.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, 10, 3)}
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sharded_fused_sampling_shard_map(mesh):
    """make_fused_sample_fn(mesh=...) fans the Pallas reverse chain out via
    shard_map: per-device batches, distinct per-device key streams."""
    gd = _tiny_gd(timesteps=8)
    params = gd.init_params(jax.random.PRNGKey(0))
    fn = gd.make_fused_sample_fn(params, 16, interpret=True, mesh=mesh)
    out = fn(jax.random.PRNGKey(4))
    assert out.shape == (16, 10, 3)
    assert len(out.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, 10, 3)}
    arr = np.asarray(out)
    assert np.all(np.isfinite(arr))
    # per-device key streams differ -> shards are not copies of each other
    assert not np.allclose(arr[:2], arr[2:4])


def test_sharded_langevin_chains_public_api(mesh):
    """LangevinSimulation(mesh=...) shards the chain axis through the public
    API; the trajectory equals the unsharded run bitwise and the carried
    state is actually distributed."""
    from twoforone_tpu.dynamics.integrators import LangevinSimulation

    def force_fn(x):
        return jnp.zeros(x.shape[0]), -x

    x0 = np.random.default_rng(2).normal(size=(16, 10, 3)).astype(np.float32)
    kwargs = dict(
        force_fn=force_fn, initial_coordinates=x0, dt=0.01, beta=1.0,
        friction=None, length=100, save_interval=10, random_seed=0,
    )
    ref = LangevinSimulation(**kwargs).simulate()

    sim = LangevinSimulation(**kwargs, mesh=mesh)
    traj = sim.simulate()
    assert traj.shape == (16, 10, 10, 3)
    np.testing.assert_allclose(traj, ref, atol=1e-6)
    # the carried integrator state is device-sharded over the chain axis
    x_state = sim._state[0]
    assert len(x_state.sharding.device_set) == 8
    assert {s.data.shape for s in x_state.addressable_shards} == {(2, 10, 3)}

    # chain counts not divisible by the mesh raise a clear error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible by the mesh"):
        LangevinSimulation(
            force_fn=force_fn, initial_coordinates=x0[:10], dt=0.01,
            friction=None, length=100, save_interval=10, mesh=mesh,
        )


def test_sharded_fused_force_fn_shard_map(mesh):
    """make_diffusion_force_fn(mesh=...) with a Pallas path fans the kernel
    out per device via shard_map (a pallas_call has no GSPMD partitioning
    rule — without the wrap, jit over sharded chains would gather or fail);
    forces match the single-device kernel and stay chain-sharded."""
    from twoforone_tpu.dynamics.langevin import make_diffusion_force_fn
    from twoforone_tpu.parallel.mesh import chain_sharding

    gd = _tiny_gd(timesteps=1000)
    params = gd.init_params(jax.random.PRNGKey(0))
    x = np.random.default_rng(5).normal(size=(16, 10, 3)).astype(np.float32)
    x = x - x.mean(axis=1, keepdims=True)

    f_single = make_diffusion_force_fn(
        gd, params, t=20, kbt_inv=1.0, fused="cl", interpret=True,
    )
    f_mesh = make_diffusion_force_fn(
        gd, params, t=20, kbt_inv=1.0, fused="cl", interpret=True,
        mesh=mesh, n_chains=16,
    )
    _, forces_ref = jax.jit(f_single)(jnp.asarray(x))
    xs = jax.device_put(jnp.asarray(x), chain_sharding(mesh))
    _, forces = jax.jit(f_mesh)(xs)
    np.testing.assert_allclose(
        np.asarray(forces), np.asarray(forces_ref), atol=1e-5
    )
    assert len(forces.sharding.device_set) == 8
    assert {s.data.shape for s in forces.addressable_shards} == {(2, 10, 3)}


def test_fused_auto_gate_uses_per_device_chains():
    """The clx auto-gate thresholds are measured PER DEVICE: a global chain
    count above CLX_MIN_CHAINS that shards to fewer than the threshold per
    device must not select clx (measured slower below ~256 chains/device).
    make_diffusion_force_fn divides n_chains by the mesh size before
    calling this resolver."""
    from twoforone_tpu.dynamics.langevin import resolve_fused_mode
    from twoforone_tpu.ops.fused_score_clx import CLX_MIN_CHAINS

    model = GraphTransformer(
        num_beads=20, hidden_nf=16, n_layers=1,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True,
    )
    assert CLX_MIN_CHAINS == 256
    # single device, enough chains -> clx
    assert resolve_fused_mode(model, "auto", 1024, "tpu") == "clx"
    # 1024 global / 8 devices = 128 per device -> below threshold -> XLA
    assert resolve_fused_mode(model, "auto", 1024 // 8, "tpu") == "never"
    # CPU backend never auto-selects a Pallas path
    assert resolve_fused_mode(model, "auto", 1024, "cpu") == "never"
    # explicit modes pass through regardless
    assert resolve_fused_mode(model, "clx", 8, "tpu") == "clx"
    small = GraphTransformer(
        num_beads=10, hidden_nf=16, n_layers=1,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True,
    )
    assert resolve_fused_mode(small, "auto", 8, "tpu") == "cl"


def test_sharded_langevin_diffusion_driver(mesh):
    """LangevinDiffusion(mesh=...) — the production driver path — places its
    integrator state on the mesh."""
    from twoforone_tpu.dynamics.langevin import LangevinDiffusion

    gd = _tiny_gd(timesteps=1000)
    params = gd.init_params(jax.random.PRNGKey(0))
    init = np.random.default_rng(3).normal(size=(8, 10, 3)).astype(np.float32)
    init = (init - init.mean(axis=1, keepdims=True)) * gd.norm_factor
    sampler = LangevinDiffusion(
        gd, params, init, n_timesteps=20, save_interval=10, t=20,
        temp_data=340, temp_sim=340, dt=2e-3, masses=[12.0] * 10,
        friction=1.0, log=False, mesh=mesh,
    )
    traj = sampler.sample()
    assert traj.shape == (16, 10, 3)
    assert np.all(np.isfinite(traj))
    assert len(sampler.sim._state[0].sharding.device_set) == 8


def test_initialize_distributed_single_process_noop(monkeypatch):
    """No coordinator configured anywhere -> logged no-op returning False
    (so launch scripts can pass --multihost unconditionally)."""
    from twoforone_tpu.parallel.mesh import initialize_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
    assert initialize_distributed(num_processes=1) is False
    # jax still single-process and usable afterwards
    assert jax.process_count() == 1


def test_trainer_local_batch_accounting(tmp_path):
    """Single-process: local batch == global batch; the multihost split
    plumbing must not perturb the default path."""
    from tests.test_train import _tiny_trainer

    trainer, _ = _tiny_trainer(tmp_path, "mh_noop")
    assert trainer.process_count == 1
    assert trainer.local_batch == trainer.batch_size


@pytest.mark.slow  # subprocess re-exec + full compile; the driver runs this
def test_driver_dryrun():  # gate itself every round (MULTICHIP_r{N}.json)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_driver_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (100, 10, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
