"""Sampling CLI — flag-parity port of reference sample.py:18-253.

Two generative modes:
- ``--gen_mode iid``: batched reverse-diffusion sampling (one lax.scan over
  the T=1000 chain per batch),
- ``--gen_mode langevin``: i.i.d. samples as initial states, then the
  BAOA(F)B Langevin engine with the diffusion force field at ``--noise_level``.

Loads config.json or a legacy reference args.pickle, and checkpoints in
either this framework's msgpack format or (converted) torch ``model-*.pt``.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="coarse-graining-evaluator")
    p.add_argument("--model_path", type=str, required=True,
                   help="root directory where models and config are stored")
    p.add_argument("--model_checkpoint", type=str, default="best",
                   help="best, last, 1, 2, 3, ...")
    p.add_argument("--gen_mode", type=str, default="iid",
                   help="generative mode, either iid or langevin")
    p.add_argument("--append_exp_name", type=str, default=None)
    p.add_argument("--data_folder", type=str, default=None,
                   help="if None (default) work with empty datasets and golden references")
    # i.i.d. generation
    p.add_argument("--num_samples_eval", type=int, default=1000)
    p.add_argument("--batch_size_gen", type=int, default=256)
    # Langevin simulation
    p.add_argument("--masses", type=str, default=None, help="Units in g/mol (json list)")
    p.add_argument("--friction", type=float, default=1, help="ps^-1, usually 1")
    p.add_argument("--parallel_sim", type=int, default=100)
    p.add_argument("--n_timesteps", type=int, default=10000)
    p.add_argument("--save_interval", type=int, default=250)
    p.add_argument("--noise_level", type=int, default=20,
                   help="diffusion model noise level for extracting force fields")
    p.add_argument("--dt", type=float, default=None,
                   help="ps; if None computed from the diffusion model parameters")
    p.add_argument("--dt_scale", type=float, default=None,
                   help="multiply dt (incl. auto-dt) by this; <1 trades "
                        "wall-clock for a lower BAOAB stationary bias — the "
                        "lever the chain35/56 control tuning used "
                        "(docs/STATUS_ROUND4.md). Default: the measured "
                        "per-protein production value "
                        "(data/molecules.default_dt_scale; villin-scale 0.5, "
                        "protein_g-scale 0.35 — the auto-dt default "
                        "measurably biases BAOAB there)")
    p.add_argument("--temp_data", type=float, default=None)
    p.add_argument("--temp_sim", type=float, default=None)
    p.add_argument("--tempering", action="store_true",
                   help="enable the tempering ramp (langevin mode): kbT starts "
                        "at --reference_temp, anneals to temp_sim, holds, and "
                        "ramps back (reference langevin_cgnet.py:724-735)")
    p.add_argument("--reference_temp", type=float, default=None,
                   help="tempering start/end temperature in K "
                        "(default: the per-protein temp_dict_pt table)")
    p.add_argument("--kb", type=str, default="consistent", help="consistent, kcal")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 score-net compute in the Langevin loop and "
                        "the plain-XLA iid reverse chain (~1.4x at large N; "
                        "physics-validated, docs/PERF_NOTES.md)")
    p.add_argument("--fused", type=str, default="never",
                   choices=["never", "auto", "cl", "clx", "always"],
                   help="fused Pallas force path: never | auto | cl | clx | "
                        "always (cl = N<=10 mega-kernel, clx = large-N "
                        "attention-core path; compiles cached persistently)")
    p.add_argument("--sample_steps", type=int, default=None,
                   help="strided DDIM reverse chain with this many score "
                        "evaluations instead of the full T (iid mode and "
                        "langevin initial states; throughput ~T/steps). "
                        "100 is the measured production knee: +0.003 TIC-JS "
                        "vs 200 steps at N=20 and N=35, 100k-sample "
                        "resolution (docs/PERF_NOTES.md round-4 ladder). "
                        "Default: full ancestral chain, reference behavior")
    p.add_argument("--ddim_eta", type=float, default=0.0,
                   help="DDIM noise scale (0 = deterministic, 1 = ancestral "
                        "noise level); only with --sample_steps")
    p.add_argument("--solver", type=str, default="ddim",
                   choices=["ddim", "dpm2m"],
                   help="strided-chain solver (with --sample_steps): ddim "
                        "(Song et al. 2020, the measured production default) "
                        "or dpm2m (DPM-Solver++(2M), second-order multistep, "
                        "deterministic, ignores --ddim_eta; never beat ddim "
                        "on trained production controls at 100k-sample "
                        "resolution — it amplifies score-net error; wins "
                        "only with near-exact scores. docs/PERF_NOTES.md "
                        "round-4 quality ladder)")
    return p


def load_model(model_path: str, checkpoint: str, data_folder=None):
    """Rebuild (GaussianDiffusion, ema_params, trainset, config) from a results dir."""
    import jax

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.data.datasets import get_dataset
    from twoforone_tpu.models import get_model
    from twoforone_tpu.utils.checkpoint import load_checkpoint
    from twoforone_tpu.utils.config import load_config
    from twoforone_tpu.utils.convert import load_torch_checkpoint_as_params

    cfg = load_config(model_path)
    cfg.data_folder = data_folder
    trainset, _, _ = get_dataset(
        cfg.mol,
        cfg.mean0,
        data_folder,
        cfg.fold,
        shuffle_before_splitting=cfg.shuffle_data_before_splitting,
    )
    norm_factor = trainset.std if cfg.scale_data else 1.0
    model = get_model(cfg, trainset.num_beads)
    gd = GaussianDiffusion(
        model=model,
        num_atoms=trainset.num_beads,
        timesteps=cfg.diffusion_steps,
        norm_factor=norm_factor,
        loss_weights=cfg.loss_weights,
    )
    msgpack = os.path.join(model_path, f"model-{checkpoint}.msgpack")
    torch_pt = os.path.join(model_path, f"model-{checkpoint}.pt")
    if os.path.exists(msgpack):
        template = {"ema_params": gd.init_params(jax.random.PRNGKey(0))}
        state = load_checkpoint(model_path, checkpoint, None)
        from flax import serialization

        ema_params = serialization.from_state_dict(
            template["ema_params"], state["ema_params"]
        )
    elif os.path.exists(torch_pt):
        ema_params = load_torch_checkpoint_as_params(torch_pt, model)
    else:
        raise FileNotFoundError(f"No checkpoint {checkpoint} under {model_path}")
    return gd, ema_params, trainset, cfg


def main(argv=None):
    import jax

    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from twoforone_tpu.data.molecules import (
        default_dt_scale,
        temp_dict,
        temp_dict_pt,
    )
    from twoforone_tpu.data.pdb import save_pdb
    from twoforone_tpu.dynamics.langevin import LangevinDiffusion
    from twoforone_tpu.evaluate.evaluators import sample_from_model

    samp_args = build_parser().parse_args(argv)
    gd, ema_params, trainset, cfg = load_model(
        samp_args.model_path, samp_args.model_checkpoint, samp_args.data_folder
    )

    if samp_args.temp_data is None:
        samp_args.temp_data = temp_dict[cfg.mol.upper()]
    if samp_args.temp_sim is None:
        samp_args.temp_sim = temp_dict[cfg.mol.upper()]

    basic_append = f"_{samp_args.gen_mode}"
    append = (
        basic_append
        if samp_args.append_exp_name is None
        else f"{basic_append}_{samp_args.append_exp_name}"
    )
    eval_folder = Path(samp_args.model_path) / ("main_eval_output" + append)
    eval_folder.mkdir(exist_ok=True, parents=False)

    # Multi-chip fan-out: shard the batch/chain axis over all local devices
    # (the reference wraps sampling in DataParallel, sample.py:180-186; here
    # it is a 1D mesh with zero hot-loop collectives).
    from twoforone_tpu.parallel.mesh import get_mesh, round_to_mesh

    mesh = get_mesh() if len(jax.devices()) > 1 else None
    key = jax.random.PRNGKey(samp_args.seed)
    batch = round_to_mesh(samp_args.batch_size_gen, mesh)
    # Chains are padded up to a mesh multiple so every device carries the
    # same shard; the padding chains are simulated and then dropped, so the
    # user-visible output has exactly --parallel_sim chains (reference
    # semantics, sample.py:204-214).
    sim_requested = samp_args.parallel_sim
    sim_padded = round_to_mesh(sim_requested, mesh)
    if mesh is not None:
        n_dev = len(jax.devices())
        print(f"Sharding over {n_dev} devices "
              f"(batch {batch}, parallel_sim {sim_padded})")
    # Resolve --fused for iid mode with the same backend gate as the Langevin
    # path (dynamics/langevin.py): "auto" on a CPU host keeps the standard XLA
    # path instead of building a non-interpret Pallas TPU kernel.
    fused_mode = samp_args.fused
    if fused_mode == "auto" and jax.default_backend() == "cpu":
        fused_mode = "never"
    if fused_mode != "never" and getattr(gd.model, "conservative", False):
        # Fused Pallas reverse chain; forward the flag to the kernel choice
        # ("always" is documented as the head-packed kernel, "cl" forces the
        # chain-lane kernel, "auto" picks per model config).
        kernel = {"always": "packed", "cl": "cl", "clx": "clx",
                  "auto": "auto"}[fused_mode]
        fused_fn = gd.make_fused_sample_fn(
            ema_params, batch, kernel=kernel, mesh=mesh,
            sample_steps=samp_args.sample_steps, eta=samp_args.ddim_eta,
            solver=samp_args.solver,
        )
        driver = lambda b, k: fused_fn(k)
    else:
        sample_fn = gd.make_sample_fn(
            batch, mesh=mesh,
            sample_steps=samp_args.sample_steps, eta=samp_args.ddim_eta,
            solver=samp_args.solver, bf16=samp_args.bf16,
        )
        driver = lambda b, k: sample_fn(ema_params, k)

    if samp_args.gen_mode == "iid":
        sampled_mol = sample_from_model(
            driver, samp_args.num_samples_eval, batch, key=key, verbose=True
        )
    elif samp_args.gen_mode == "langevin":
        n_save = int(sim_requested * samp_args.n_timesteps / samp_args.save_interval)
        print(f"Total number of samples to save using Langevin Dynamics: {n_save}")
        # Initial states: i.i.d. samples from the same model (paper procedure
        # when data is unavailable, reference sample.py:196-214).
        init_mol = sample_from_model(
            driver, sim_padded, batch, key=key, verbose=True
        )
        masses = samp_args.masses
        if masses is None:
            m = 12.8 if "alanine" in cfg.mol else 12.0
            masses = [m] * trainset.num_beads
        else:
            import json

            masses = json.loads(masses)
        dt_scale = samp_args.dt_scale
        if dt_scale is None:
            # Measured per-protein production default (data/molecules.py):
            # at villin/protein_g scale the undersized knob is silently
            # biased physics (round-4 verdict), so the table is the default,
            # not 1.0.
            dt_scale = default_dt_scale(cfg.mol, trainset.num_beads)
            if dt_scale != 1.0:
                print(f"Using measured production dt_scale={dt_scale} for "
                      f"{cfg.mol} (override with --dt_scale)")
        sampler = LangevinDiffusion(
            gd,
            ema_params,
            init_mol,
            n_timesteps=samp_args.n_timesteps,
            save_interval=samp_args.save_interval,
            t=samp_args.noise_level,
            temp_data=samp_args.temp_data,
            temp_sim=samp_args.temp_sim,
            dt=samp_args.dt,
            dt_scale=dt_scale,
            masses=masses,
            friction=samp_args.friction,
            kb=samp_args.kb,
            random_seed=samp_args.seed,
            fused=samp_args.fused,
            bf16=samp_args.bf16,
            mesh=mesh,
        )
        reference_temp = None
        if samp_args.tempering:
            reference_temp = (
                samp_args.reference_temp
                if samp_args.reference_temp is not None
                else temp_dict_pt[cfg.mol.upper()]
            )
            print(f"Tempering ramp enabled: reference_temp={reference_temp} K")
        sampled_mol = sampler.sample(reference_temp=reference_temp)
        if sim_padded != sim_requested:
            # Drop the padding chains: sample() returns chains-major
            # (n_sims * n_saves, beads, 3).
            sampled_mol = np.asarray(sampled_mol)
            sampled_mol = sampled_mol.reshape(
                sim_padded, -1, *sampled_mol.shape[1:]
            )[:sim_requested].reshape(-1, *sampled_mol.shape[1:])
    else:
        raise ValueError("Wrong argument 'gen_mode'")

    np.save(str(eval_folder / f"sample-{samp_args.gen_mode}.npy"), sampled_mol)
    try:
        # Torch-format export for the reference's notebook consumers
        # (reference sample.py:242-247 saves the sampled tensor as .pt).
        import torch

        torch.save(
            torch.from_numpy(np.asarray(sampled_mol)),
            str(eval_folder / f"sample-{samp_args.gen_mode}.pt"),
        )
    except ImportError:
        pass
    save_pdb(
        str(eval_folder / f"sample-{samp_args.gen_mode}.pdb"),
        np.asarray(sampled_mol[:1000]),
        trainset.topology,
    )
    return sampled_mol


if __name__ == "__main__":
    main()
