import jax
import jax.numpy as jnp
import numpy as np

from twoforone_tpu.ops.geometry import (
    center_zero,
    dihedrals,
    kabsch_rmsd,
    pwd_triu_batch,
    random_rotation,
    reverse_rotation,
    sliding_dihedral_indices,
)


def test_center_zero():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 3)) + 5.0
    xc = center_zero(x)
    np.testing.assert_allclose(np.asarray(xc.mean(axis=1)), 0.0, atol=1e-5)


def test_random_rotation_preserves_geometry():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (8, 10, 3))
    rot_key = jax.random.PRNGKey(2)
    y, rots = random_rotation(x, rot_key, return_matrices=True)
    # rotations are orthogonal with det +1
    dets = np.linalg.det(np.asarray(rots))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)
    # pairwise distances invariant
    np.testing.assert_allclose(
        np.asarray(pwd_triu_batch(x)), np.asarray(pwd_triu_batch(y)), atol=1e-4
    )
    # reverse recovers input
    np.testing.assert_allclose(np.asarray(reverse_rotation(y, rots)), np.asarray(x), atol=1e-5)


def test_pwd_triu_batch_counts():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 3))
    assert pwd_triu_batch(x, offset=1).shape == (2, 45)
    assert pwd_triu_batch(x, offset=3).shape == (2, 10 * 9 // 2 - 9 - 8)
    # hand check one entry
    pwd = pwd_triu_batch(x, offset=1)
    d01 = jnp.linalg.norm(x[0, 0] - x[0, 1])
    np.testing.assert_allclose(float(pwd[0, 0]), float(d01), rtol=1e-6)


def test_dihedrals_known_values():
    # Planar cis arrangement -> 0, trans -> pi, right-handed +90 deg
    cis = jnp.array([[[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 1, 0]]])
    trans = jnp.array([[[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, -1, 0]]])
    quarter = jnp.array([[[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 0, 1]]])
    idx = [[0, 1, 2, 3]]
    np.testing.assert_allclose(float(dihedrals(cis, idx)[0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(abs(float(dihedrals(trans, idx)[0, 0])), np.pi, atol=1e-6)
    # mdtraj sign convention: this arrangement gives +pi/2
    np.testing.assert_allclose(float(dihedrals(quarter, idx)[0, 0]), np.pi / 2, atol=1e-6)


def test_dihedrals_rotation_invariant():
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 10, 3))
    idx = sliding_dihedral_indices(10)
    d0 = dihedrals(x, idx)
    y = random_rotation(x, jax.random.PRNGKey(5))
    d1 = dihedrals(y, idx)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)


def test_kabsch_rmsd():
    key = jax.random.PRNGKey(6)
    ref = jax.random.normal(key, (10, 3))
    # rotated + translated copies must give ~0 rmsd
    batch = jnp.tile(ref[None], (5, 1, 1))
    rotated = random_rotation(batch, jax.random.PRNGKey(7)) + 3.0
    rmsd = kabsch_rmsd(rotated, ref)
    np.testing.assert_allclose(np.asarray(rmsd), 0.0, atol=1e-4)
    # perturbed copy has rmsd less than naive distance but > 0
    noisy = batch + 0.1 * jax.random.normal(jax.random.PRNGKey(8), batch.shape)
    r = np.asarray(kabsch_rmsd(noisy, ref))
    assert np.all(r > 0.01) and np.all(r < 0.2)
