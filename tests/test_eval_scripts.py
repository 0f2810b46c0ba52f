"""Smoke tests for the notebook-parity evaluation scripts.

The reference's end-to-end validation lives in two notebooks
(evaluate/evaluate_ala2.ipynb, evaluate/evaluate_fastfolders.ipynb); here
they are scripts (scripts/evaluate_ala2.py, scripts/evaluate_fastfolders.py).
The metric internals are unit-tested in test_evaluators.py; these tests run
the SCRIPTS end to end in a subprocess on small random samples — argument
parsing, golden-reference loading, plot/JSON artifact writing, and (for the
fast-folder script) the trajectory/kinetics branch.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=900,
    )


def test_evaluate_ala2_script(tmp_path):
    rng = np.random.default_rng(0)
    samples = (rng.normal(size=(400, 5, 3)) * 0.9).astype(np.float32)
    path = tmp_path / "sample.npy"
    np.save(path, samples)

    res = _run("evaluate_ala2.py", "--samples", str(path),
               "--out", str(tmp_path / "out"))
    assert res.returncode == 0, res.stderr[-2000:]
    rec = json.load(open(tmp_path / "out" / "results_ala2.json"))
    # random coords score badly but finitely against the golden probs
    assert np.isfinite(rec["Dihedral JS"])


def test_evaluate_fastfolders_script_trajectory(tmp_path):
    rng = np.random.default_rng(1)
    # 4 chains x 100 frames of chignolin-scale coordinates (std ~3 A)
    samples = (rng.normal(size=(400, 10, 3)) * 3.1).astype(np.float32)
    path = tmp_path / "traj.npy"
    np.save(path, samples)

    res = _run(
        "evaluate_fastfolders.py", "--mol", "chignolin",
        "--samples", str(path), "--out", str(tmp_path / "out"),
        "--trajectory", "--n-sims", "4", "--n-clusters", "3",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    rec = json.load(open(tmp_path / "out" / "results_chignolin.json"))
    assert np.isfinite(rec["PWD JS (offset 3)"])
    assert np.isfinite(rec["TIC JS"])
    tm = np.asarray(rec["transition_matrix"])
    assert tm.shape == (3, 3)
    # transition matrix rows are distributions (or all-zero for empty states)
    sums = tm.sum(axis=1)
    assert np.all((np.abs(sums - 1) < 1e-6) | (sums == 0))
