"""End-to-end CLI integration: train on synthetic ala2 data, then sample
i.i.d. and via Langevin dynamics from the saved checkpoint."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train loops / physics pipelines (run with -m slow)


@pytest.fixture(scope="module")
def data_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(800, 5, 3)).astype(np.float32) * 0.9449
    np.savez(d / "ala2_cg_2fs_Hmass_2_HBonds.npz", coords=coords)
    return str(d)


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory, data_folder):
    from twoforone_tpu.cli.train import main

    out = tmp_path_factory.mktemp("results")
    main([
        "--mol", "alanine_dipeptide",
        "--data_folder", data_folder,
        "--results_folder", str(out),
        "--tensorboard_folder", str(out / "runs"),
        "--experiment_name", "clitest",
        "--hidden_features_gnn", "16",
        "--num_layers_gnn", "1",
        "--use_intrinsic_coords", "true",
        "--use_abs_coords", "false",
        "--use_distances", "false",
        "--conservative", "true",
        "--batch_size", "16",
        "--train_iter", "8",
        "--eval_interval", "4",
        "--num_samples", "4",
        "--num_samples_final_eval", "4",
        "--iterations_on_val", "0.1",
        "--log_tensorboard_interval", "4",
        "--loss_weights", "higheruntil_100",
        "--ala2_train_cap", "500",
    ])
    return str(out / "clitest_")


def test_train_cli_artifacts(trained_dir):
    assert os.path.exists(os.path.join(trained_dir, "model-best.msgpack"))
    assert os.path.exists(os.path.join(trained_dir, "model-last.msgpack"))
    cfg = json.load(open(os.path.join(trained_dir, "config.json")))
    assert cfg["mol"] == "alanine_dipeptide_fuberlin"
    assert cfg["hidden_features_gnn"] == 16
    results = json.load(open(os.path.join(trained_dir, "results-final_iid_val.json")))
    assert "Dihedral JS" in results


def test_sample_cli_iid(trained_dir, data_folder):
    from twoforone_tpu.cli.sample import main

    out = main([
        "--model_path", trained_dir,
        "--gen_mode", "iid",
        "--num_samples_eval", "6",
        "--batch_size_gen", "4",
        "--data_folder", data_folder,
    ])
    assert out.shape == (6, 5, 3)
    eval_dir = os.path.join(trained_dir, "main_eval_output_iid")
    assert os.path.exists(os.path.join(eval_dir, "sample-iid.npy"))
    assert os.path.exists(os.path.join(eval_dir, "sample-iid.pdb"))


def test_sample_cli_iid_ddim(trained_dir, data_folder):
    """--sample_steps runs the strided DDIM reverse chain (8 score evals
    instead of the full T) through the same CLI surface."""
    from twoforone_tpu.cli.sample import main

    out = main([
        "--model_path", trained_dir,
        "--gen_mode", "iid",
        "--num_samples_eval", "6",
        "--batch_size_gen", "4",
        "--data_folder", data_folder,
        "--sample_steps", "8",
        "--ddim_eta", "0.5",
        "--append_exp_name", "ddim",
    ])
    assert out.shape == (6, 5, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out).mean(axis=1), 0.0, atol=1e-3)


def test_sample_cli_iid_bf16(trained_dir, data_folder):
    """--bf16 runs the reverse chain with bfloat16 score-net compute
    (distribution-level equality with f32 is asserted in
    tests/test_diffusion.py; this drives the CLI surface)."""
    from twoforone_tpu.cli.sample import main

    out = main([
        "--model_path", trained_dir,
        "--gen_mode", "iid",
        "--num_samples_eval", "6",
        "--batch_size_gen", "4",
        "--data_folder", data_folder,
        "--bf16",
        "--append_exp_name", "bf16",
    ])
    assert out.shape == (6, 5, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out).mean(axis=1), 0.0, atol=1e-3)


def test_sample_cli_langevin(trained_dir):
    from twoforone_tpu.cli.sample import main

    out = main([
        "--model_path", trained_dir,
        "--gen_mode", "langevin",
        "--parallel_sim", "4",
        "--batch_size_gen", "4",
        "--n_timesteps", "40",
        "--save_interval", "10",
        "--noise_level", "8",
        "--dt", "0.002",
    ])
    # 4 chains x 4 saves
    assert out.shape == (16, 5, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    eval_dir = os.path.join(trained_dir, "main_eval_output_langevin")
    assert os.path.exists(os.path.join(eval_dir, "sample-langevin.npy"))


def test_sample_cli_langevin_dt_scale(trained_dir):
    """--dt_scale shrinks the step: with auto-dt the halved-dt trajectory
    must differ from the default one (the knob the chain35/56 control
    tuning used; it must reach the integrator from the CLI)."""
    from twoforone_tpu.cli.sample import main

    common = [
        "--model_path", trained_dir,
        "--gen_mode", "langevin",
        "--parallel_sim", "2",
        "--batch_size_gen", "2",
        "--n_timesteps", "20",
        "--save_interval", "10",
        "--noise_level", "8",
    ]
    out_full = main(common + ["--append_exp_name", "dtfull"])
    out_half = main(common + ["--dt_scale", "0.5",
                              "--append_exp_name", "dthalf"])
    assert out_full.shape == out_half.shape
    assert np.all(np.isfinite(np.asarray(out_half)))
    assert not np.allclose(np.asarray(out_full), np.asarray(out_half))
