"""Positive control: the framework must LEARN to reference metric levels.

Round-1 tests only proved that a *random* model scores badly
(test_evaluators) and that the machinery is self-consistent on a Gaussian
(test_pipeline_physics). This is the missing direction: a model trained
through the full ``Trainer.train()`` path on a synthetic 4-basin torsion
system must reproduce the generator's dihedral and pairwise-distance
distributions — for i.i.d. reverse-chain samples AND for Langevin dynamics
from the extracted force field — and bf16 Langevin must match f32 at
distribution level (the claim behind bench.py's bf16 headline).

Anchors: reference trainer.py:237-341 (the de-facto validation loop) and
evaluate/evaluators.py dihedral JS scale for trained ala2 models.
"""

import pytest

from twoforone_tpu.train.positive_control import run_positive_control

pytestmark = pytest.mark.slow  # full train loop; run with -m slow


def test_trained_model_reaches_low_js(tmp_path):
    results = run_positive_control(
        train_iter=3500,
        n_data=40000,
        batch_size=256,
        num_samples=6000,
        langevin_chains=96,
        langevin_steps=12000,
        langevin_save_interval=50,
        results_folder=str(tmp_path),
        seed=0,
    )
    print(results)

    # The statistical noise floor of the JS estimator at this sample count
    # (two independent draws from the same generator) must itself be well
    # under the bar, otherwise the assertion is vacuous.
    assert results["js_floor"] < 0.02, results
    assert results["pwd_js_floor"] < 0.01, results

    # i.i.d. samples through the full T=1000 reverse chain.
    assert results["js_iid"] < 0.05, results
    assert results["pwd_js_iid"] < 0.05, results

    # Langevin from the extracted force field (t=15, minimal smoothing).
    assert results["js_langevin_f32"] < 0.05, results
    assert results["pwd_js_langevin_f32"] < 0.05, results

    # bf16 == f32 at distribution level: their mutual JS must be of the same
    # order as the floor, and bf16 must clear the same absolute bar.
    assert results["js_langevin_bf16"] < 0.05, results
    assert results["js_bf16_vs_f32"] < 0.03, results
    assert results["pwd_js_bf16_vs_f32"] < 0.02, results
