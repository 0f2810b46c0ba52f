"""Segment-checkpointed Langevin driving (dynamics/segmented.py): the
mechanism that bounds a control run's bench-preemption latency and crash
redo cost to one segment. Contracts:

- segmenting is invisible: the output equals ``LangevinDiffusion.sample()``
  bit for bit (per-save-period RNG keys make the trajectory split-invariant),
- a run killed between segments resumes from the persisted state and still
  produces identical frames,
- the _segmented_langevin_stage wrapper honors the post_{name}.npy cached-
  stage contract and cleans its intermediates.
"""

import os

import jax
import numpy as np

from twoforone_tpu.core.diffusion import GaussianDiffusion
from twoforone_tpu.dynamics.langevin import LangevinDiffusion
from twoforone_tpu.dynamics.segmented import cleanup, segmented_sample
from twoforone_tpu.models.graph_transformer import GraphTransformer


def _ld(**kw):
    model = GraphTransformer(
        num_beads=5, hidden_nf=16, n_layers=1,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True,
    )
    gd = GaussianDiffusion(model=model, num_atoms=5, timesteps=1000,
                           norm_factor=2.0, loss_weights="ones")
    params = gd.init_params(jax.random.PRNGKey(0))
    init = np.random.default_rng(3).normal(size=(4, 5, 3)).astype(np.float32)
    init -= init.mean(axis=1, keepdims=True)
    defaults = dict(n_timesteps=400, save_interval=50, t=8, temp_data=300,
                    temp_sim=300, dt=None, masses=[12.8] * 5, friction=1.0,
                    kb="consistent", random_seed=1, log=False)
    defaults.update(kw)
    return LangevinDiffusion(gd, params, init, **defaults)


def test_segmented_equals_one_shot(tmp_path):
    one_shot = _ld().sample()
    seg = segmented_sample(_ld(), str(tmp_path), "lang", segment_steps=100)
    assert np.array_equal(one_shot, seg)
    # 4 segment files + the state checkpoint were persisted, then removable
    files = sorted(os.listdir(tmp_path))
    assert [f for f in files if f.startswith("lang_seg")] == [
        f"lang_seg{i:04d}.npy" for i in range(4)
    ]
    cleanup(str(tmp_path), "lang")
    assert not os.listdir(tmp_path)


def test_kill_between_segments_resumes_identically(tmp_path):
    reference = _ld().sample()
    # "Kill" after two segments by running a half-length copy of the run,
    # then resume the full run against the same folder — what the resilient
    # launcher's relaunch does after a timeout/crash/preemption.
    segmented_sample(_ld(n_timesteps=200), str(tmp_path), "lang",
                     segment_steps=100)
    resumed = segmented_sample(_ld(), str(tmp_path), "lang",
                               segment_steps=100, resume=True)
    assert np.array_equal(reference, resumed)


def test_stage_wrapper_cached_contract(tmp_path):
    from twoforone_tpu.train.positive_control import _segmented_langevin_stage

    out = _segmented_langevin_stage(_ld(), str(tmp_path), "lang_t8_dt1_s400",
                                    resume=False, segment_steps=100)
    post = tmp_path / "post_lang_t8_dt1_s400.npy"
    assert post.exists()
    assert np.array_equal(np.load(post), out)
    # intermediates cleaned, only the consolidated stage product remains
    assert sorted(os.listdir(tmp_path)) == [post.name]
    # resume path loads the cache without touching the simulation
    again = _segmented_langevin_stage(_ld(), str(tmp_path), "lang_t8_dt1_s400",
                                      resume=True, segment_steps=100)
    assert np.array_equal(again, out)
