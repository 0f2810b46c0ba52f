"""Fast checks of the production-control presets (no training).

Each preset must be internally consistent with the assets it names: the
topology PDB's C-alpha count equals the preset key (so the trained
control's sample export and evaluator paths work), and the model shape /
optimizer settings mirror the reference's shipped configs (SURVEY
"shipped model config").
"""

import os

from twoforone_tpu.data.pdb import load_pdb
from twoforone_tpu.train.positive_control import CHAIN_CONTROL_PRESETS

_ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twoforone_tpu", "assets",
)

# (hidden_nf, n_layers, batch_size) of the reference's shipped configs.
_SHIPPED = {
    10: (64, 3, 512),    # chignolin
    20: (128, 3, 512),   # trp_cage
    28: (96, 3, 512),    # bba
    35: (128, 3, 512),   # villin (35 CAs: 33 ATOM + 2 NLE HETATM)
    56: (128, 3, 256),   # protein_g
}


def test_presets_match_topologies_and_shipped_configs():
    assert set(CHAIN_CONTROL_PRESETS) == set(_SHIPPED)
    for n, preset in CHAIN_CONTROL_PRESETS.items():
        topo = load_pdb(
            os.path.join(_ASSETS, "folded_pdbs", preset["pdb"])
        ).topology
        assert topo.n_atoms == n, (preset["pdb"], topo.n_atoms, n)
        nf, layers, batch = _SHIPPED[n]
        assert preset["hidden_nf"] == nf
        assert preset["n_layers"] == layers
        assert preset.get("batch_size", 512) == batch


def test_preset_batch_size_resolution():
    """run_chain_control picks the preset batch size only when the caller
    leaves the default (None)."""
    import inspect

    from twoforone_tpu.train.positive_control import run_chain_control

    sig = inspect.signature(run_chain_control)
    assert sig.parameters["batch_size"].default is None
