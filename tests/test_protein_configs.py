"""Every shipped model configuration builds and runs (forward + loss).

Configs from saved_models/*/args.pickle (see BASELINE.md): all proteins use
intrinsic coords, no abs coords, no distances, conservative energies,
T=1000, higheruntil_100.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.data.datasets import get_dataset
from twoforone_tpu.data.molecules import Molecules, norm_stds
from twoforone_tpu.models.graph_transformer import GraphTransformer

# (mol, beads, hidden_nf, n_layers). Fast lane covers the two molecules the
# benches/physics tests exercise; the four larger fast-folders are the same
# code path at bigger shapes (slow lane).
_slow = pytest.mark.slow
SHIPPED = [
    ("alanine_dipeptide_fuberlin", 5, 96, 2),
    ("chignolin", 10, 64, 3),
    pytest.param("trp_cage", 20, 128, 3, marks=_slow),
    pytest.param("bba", 28, 96, 3, marks=_slow),
    pytest.param("villin", 35, 128, 3, marks=_slow),
    pytest.param("protein_g", 56, 128, 3, marks=_slow),
]


@pytest.mark.parametrize("mol,beads,nf,layers", SHIPPED)
def test_shipped_config_builds_and_steps(mol, beads, nf, layers):
    kwargs = {"fold": 1} if "alanine" in mol else {}
    train, _, _ = get_dataset(mol, mean0=True, data_folder=None, **kwargs)
    assert train.num_beads == beads

    model = GraphTransformer(
        num_beads=beads, hidden_nf=nf, n_layers=layers,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True,
    )
    gd = GaussianDiffusion(
        model=model, num_atoms=beads, timesteps=1000,
        norm_factor=train.std, loss_weights="higheruntil_100",
    )
    params = gd.init_params(jax.random.PRNGKey(0))
    mol_batch = jax.random.normal(jax.random.PRNGKey(1), (4, beads, 3)) * train.std
    mol_batch = mol_batch - mol_batch.mean(axis=1, keepdims=True)
    loss, aux = jax.jit(lambda p, b, k: gd.loss(p, b, k))(
        params, mol_batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    assert float(aux["kl_at_T"]) <= 1e-4


def test_all_fast_folder_stds_registered():
    for m in ("CHIGNOLIN", "TRP_CAGE", "BBA", "VILLIN", "PROTEIN_G"):
        assert Molecules[m] in norm_stds
