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


def test_sharded_sampling(mesh):
    gd = _tiny_gd(timesteps=20)
    params = replicate(gd.init_params(jax.random.PRNGKey(0)), mesh)
    shape = (16, 10, 3)
    key = jax.random.PRNGKey(3)

    @jax.jit
    def sample(params, key):
        return gd.sample(params, 16, key)

    # force the init noise to be sharded: run under mesh-sharded params
    out = np.asarray(sample(params, key))
    assert out.shape == shape
    assert np.all(np.isfinite(out))


def test_sharded_langevin_chains(mesh):
    from twoforone_tpu.dynamics.integrators import LangevinSimulation

    def force_fn(x):
        return jnp.zeros(x.shape[0]), -x

    x0 = np.random.default_rng(2).normal(size=(16, 10, 3)).astype(np.float32)
    sim = LangevinSimulation(
        force_fn=force_fn, initial_coordinates=x0, dt=0.01, beta=1.0,
        friction=None, length=100, save_interval=10, random_seed=0,
    )
    # shard the chain axis across the mesh before simulating
    sim._state = (
        jax.device_put(jnp.asarray(x0), NamedSharding(mesh, P("data", None, None))),
        None,
    )
    traj = sim.simulate()
    assert traj.shape == (16, 10, 10, 3)
    assert np.all(np.isfinite(traj))


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
