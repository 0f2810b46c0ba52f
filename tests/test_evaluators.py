import os

import numpy as np
import pytest

from twoforone_tpu.data.molecules import SAVED_REFERENCES_DIR
from twoforone_tpu.evaluate.deeptime_compat import (
    load_pwd_reference,
    load_tica_reference,
)
from twoforone_tpu.evaluate.evaluators import (
    ContactEvaluator,
    DihedralEnergiesEvaluator,
    PwdEvaluator,
    RmsdEvaluator,
    TicEvaluator,
    num_to_groups,
    sample_from_model,
)
from twoforone_tpu.evaluate.metrics import (
    free_energy_mse,
    get_prob,
    js_divergence,
    kl_div_density,
)
from twoforone_tpu.evaluate.tica import fit_tica


def test_js_divergence_sanity():
    # reference's own smoke test (evaluate/evaluators.py:951-963)
    h1 = np.array([0.1, 0.2, 0.5, 0.3, 0])
    h2 = np.array([0, 0.25, 0.5, 0.21, 0])
    assert js_divergence(h1, h2) > 0
    assert js_divergence(h1, h1) == pytest.approx(0, abs=1e-12)
    # symmetric, bounded by ln 2
    assert js_divergence(h1, h2) == pytest.approx(js_divergence(h2, h1))
    assert js_divergence(h1, h2) < np.log(2)


def test_kl_and_mse_density():
    p = np.array([[0.5, 0.5], [0.0, 0.0]])
    p = p / p.sum()
    assert kl_div_density(p, p) == pytest.approx(0.0)
    assert free_energy_mse(p, p) == pytest.approx(0.0)


def test_get_prob_normalized():
    tors = np.random.default_rng(0).uniform(-np.pi, np.pi, size=(5000, 2))
    prob = get_prob(tors)
    assert prob.shape == (60, 60)
    assert prob.sum() == pytest.approx(1.0)


def test_dihedral_evaluator_golden_and_selfscore():
    ev = DihedralEnergiesEvaluator()  # loads packaged golden ala2 testset probs
    assert ev.gt_probs.shape == (60, 60)
    # a random structure batch scores poorly, a batch drawn proportional to
    # the golden probabilities scores well
    rng = np.random.default_rng(1)
    bad = rng.normal(size=(2000, 5, 3)).astype(np.float32)
    js_bad = ev.eval(bad)[1]
    assert js_bad > 0.1


def test_pwd_evaluator_self_consistency():
    rng = np.random.default_rng(2)
    data = rng.normal(size=(4000, 10, 3)).astype(np.float32) * 3
    ev = PwdEvaluator(val_data=data, mol_name="chignolin", offset=3)
    js_same = ev.eval(data[:2000])
    js_shifted = ev.eval(data[:2000] * 1.5)
    assert js_same < 0.01
    assert js_shifted > js_same * 5


def test_pwd_golden_reference_loads():
    gt_max, gt_hist = load_pwd_reference(
        os.path.join(SAVED_REFERENCES_DIR, "saved_pwd_CHIGNOLIN_testset_offset_3.pickle")
    )
    # chignolin: 10 beads, offset 3 -> 28 pairs
    assert gt_max.shape == (28,)
    assert len(gt_hist) == 28
    ev = PwdEvaluator(mol_name="chignolin", offset=3, evalset="testset")
    rng = np.random.default_rng(3)
    fake = rng.normal(size=(500, 10, 3)).astype(np.float32) * 3
    js = ev.eval(fake)
    assert 0 < js < np.log(2)


def test_tica_golden_reference_loads_and_transforms():
    proj, gt_prob, bx, by = load_tica_reference(
        os.path.join(SAVED_REFERENCES_DIR, "saved_TICA_CHIGNOLIN_testset.pickle")
    )
    assert gt_prob.shape == (101, 101)
    feats = np.random.default_rng(4).normal(size=(7, 52))
    out = proj(feats)
    assert out.shape == (7, 2)


def test_tic_evaluator_with_golden():
    ev = TicEvaluator(mol_name="chignolin", evalset="testset")
    rng = np.random.default_rng(5)
    fake = rng.normal(size=(800, 10, 3)).astype(np.float32) * 3
    js, fig = ev.eval(fake, title="t", plot_tic=False)
    assert fig is None  # reference bug (unbound fig) fixed
    assert 0 < js <= np.log(2) + 1e-9
    # folded structure lands inside the histogram support
    assert 0 <= ev.bin_x_folded < 101 and 0 <= ev.bin_y_folded < 101


def test_fit_tica_recovers_slow_mode():
    """A 2D process with one slow and one fast coordinate: TIC0 must align
    with the slow coordinate."""
    rng = np.random.default_rng(6)
    n = 20000
    slow = np.zeros(n)
    fast = np.zeros(n)
    for i in range(1, n):
        slow[i] = 0.999 * slow[i - 1] + 0.05 * rng.normal()
        fast[i] = 0.2 * fast[i - 1] + 1.0 * rng.normal()
    feats = np.stack([slow, fast], axis=1)
    proj = fit_tica(feats, lagtime=100, dim=1)
    w = proj.coefficients[:, 0]
    assert abs(w[0]) > 10 * abs(w[1])


def test_rmsd_evaluator_and_golden():
    ev = RmsdEvaluator("chignolin")
    ref = ev.eval("Reference", cutoff=10, nbins=100)
    assert "bin_mids" in ref and "energies" in ref
    # folded structure itself has RMSD ~0
    d = ev.eval("self", ev.folded.xyz[None].repeat(4, axis=0), nbins=10, cutoff=10,
                save_dynamics=True)
    assert d["rmsd"][0] == pytest.approx(0.0, abs=1e-3)


def test_contact_evaluator():
    ev = ContactEvaluator("chignolin")
    assert ev.contacts_folded.shape == (10, 10)
    assert ev.contacts_folded.diagonal().all()  # self-distance 0 < cutoff
    folded_batch = ev.folded[None].repeat(3, axis=0)
    bce = ev.eval_bce(folded_batch)
    assert bce == pytest.approx(0.0, abs=1e-9)
    # random coil: nonzero BCE
    rng = np.random.default_rng(7)
    coil = rng.normal(size=(3, 10, 3)).astype(np.float32) * 20
    assert ev.eval_bce(coil) > 1.0


def test_num_to_groups():
    assert num_to_groups(10, 4) == [4, 4, 2]
    assert num_to_groups(8, 4) == [4, 4]


def test_sample_from_model_driver():
    import jax

    calls = []

    def fake_sample(batch_size, key):
        calls.append(batch_size)
        return np.ones((batch_size, 5, 3))

    out = sample_from_model(fake_sample, 10, 4, key=jax.random.PRNGKey(0))
    assert out.shape == (10, 5, 3)
    assert calls == [4, 4, 4]  # remainder batch runs full size, truncated


def test_trp_cage_golden_references():
    """Second protein's golden refs load and score (chignolin covered above)."""
    ev = TicEvaluator(mol_name="trp_cage", evalset="valset")
    rng = np.random.default_rng(8)
    fake = rng.normal(size=(300, 20, 3)).astype(np.float32) * 5
    js, fig = ev.eval(fake, plot_tic=False)
    assert 0 < js <= np.log(2) + 1e-9 and fig is None
    pwd = PwdEvaluator(mol_name="trp_cage", offset=3, evalset="valset")
    assert 0 < pwd.eval(fake) < np.log(2)


def test_profiling_phase_timer():
    from twoforone_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer(sync=False)
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()


@pytest.mark.parametrize(
    "mol,n_beads",
    [("chignolin", 10), ("trp_cage", 20), ("bba", 28), ("villin", 35),
     ("protein_g", 56)],
)
def test_data_free_evaluator_every_fast_folder(mol, n_beads):
    """The orchestrating Evaluator must be constructible for EVERY fast
    folder with an empty dataset (the reference's data-free contract,
    saved_references/README.md) and score a sample batch. Exercises the
    PwdEvaluator offset-3 golden-pickle fallback (the reference crashes
    here: its PwdEvaluator defaults offset=0 and only offset-3 pickles
    ship) and the TIC skip for folders without golden TICA pickles."""
    from twoforone_tpu.evaluate.evaluators import Evaluator

    ev = Evaluator(None, None, mol_name=mol, eval_folder=None)
    rng = np.random.default_rng(0)
    samples = rng.normal(size=(64, n_beads, 3)).astype(np.float32) * 3.0
    results = ev.eval(samples, milestone="datafree")
    if mol == "protein_g":
        # excluded from in-loop TIC/PWD eval (reference evaluators.py:63-77)
        assert results == {}
        return
    assert np.isfinite(results["PWD JS"])
    assert ev.pwd_evaluator.offset == 3  # fell back to the shipped pickle
    if mol in ("chignolin", "trp_cage"):
        assert np.isfinite(results["TIC JS"])  # golden TICA pickles ship
    else:
        assert "TIC JS" not in results  # no golden TICA for bba/villin
