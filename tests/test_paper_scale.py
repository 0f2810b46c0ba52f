"""Paper-scale Langevin driver (scripts/paper_scale_langevin.py) contracts,
in miniature: segment streaming, state checkpointing, and the property the
production run's crash resilience rests on — a killed-and-resumed run
produces frames bit-identical to an uninterrupted one (per-save-period RNG
keys are derived from the global period index, dynamics/integrators.py
run_chunk, so the trajectory is chunking- and resume-invariant).

The production workload itself (100 chains x 6,000,000 steps on the real
chip, reference evaluate/sampling_commands.md:8-20) runs under
scripts/round5_tpu_queue.sh; its results land in
.controls/paper_scale_run/results.json and docs/PERF_NOTES.md.
"""

import os
import runpy
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # drives full reverse-chain init + Langevin

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "paper_scale_langevin.py")


def _run(out, steps, chains=4, segment=1000, save_interval=100):
    argv = sys.argv
    sys.argv = [
        "paper_scale_langevin.py", "--out", str(out),
        "--chains", str(chains), "--steps", str(steps),
        "--segment_steps", str(segment), "--save_interval",
        str(save_interval),
    ]
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = argv


def _frames(out, n_segments):
    return np.concatenate(
        [np.load(os.path.join(out, f"coords_seg{s:03d}.npy"))
         for s in range(n_segments)], axis=1,
    )


@pytest.mark.skipif(
    not os.path.exists(os.path.join(
        REPO, "twoforone_tpu", "assets", "trained", "chain10",
        "model-best.msgpack")),
    reason="chain10 artifact not staged",
)
def test_killed_and_resumed_run_is_bit_identical(tmp_path):
    interrupted = tmp_path / "interrupted"
    straight = tmp_path / "straight"
    # "Kill" at the halfway segment boundary by asking for half the steps,
    # then relaunch with the full budget against the same folder — exactly
    # what the resilient launcher does after a timeout/crash.
    _run(interrupted, steps=2000)
    _run(interrupted, steps=4000)
    _run(straight, steps=4000)

    a = _frames(interrupted, 4)
    b = _frames(straight, 4)
    assert a.shape == (4, 40, 10, 3)
    assert np.array_equal(a, b)

    import json

    with open(interrupted / "results.json") as f:
        res = json.load(f)
    assert res["frames_saved"] == 160
    assert res["resumes"] == 1
    with open(interrupted / "meta.json") as f:
        meta = json.load(f)
    assert meta["segments_done"] == 4
