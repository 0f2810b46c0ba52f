"""Paper-scale Langevin production workload on the trained chignolin-scale
control artifact — the reference's headline sampling command at full size
(/root/reference/evaluate/sampling_commands.md:8-20):

    100 chains x 6,000,000 steps, save_interval 500  (1.2M saved frames)

Control runs exercise the same machinery at 50k steps; this run exercises
what only production scale can:

- 12,000 save boundaries and multi-(wall-)hour-on-reference scan chunking
- segment streaming to disk (bounded host memory at any point in the run)
- mid-run kill + resume from the checkpointed integrator state
- bench preemption at lossless segment boundaries (utils/preempt protocol)

The trajectory is chunking- and resume-invariant by construction (per-save-
period RNG keys are derived from the global period index — see
dynamics/integrators.py run_chunk), so a killed-and-resumed run produces
the same frames as an uninterrupted one.

Run under the chip-lock/resilience wrapper:

    CONTROL_CMD="/opt/venv/bin/python -u scripts/paper_scale_langevin.py" \
        bash scripts/run_control_resilient.sh 10

Resume: relaunch with the same --out; completed segments are skipped via
the persisted integrator state. Results land in <out>/results.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _atomic_savez(path, **arrays):
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _atomic_json(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)


def build_chain10(params_required=True):
    """The chain10 control's model/diffusion/scorer, reconstructed exactly
    (train/positive_control.py run_chain_control, n_beads=10, seed=0): the
    norm factor is the trainset std of the deterministic synthetic dataset,
    so it is recomputed rather than trusted to a side channel."""
    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.data.datasets import CGDataset
    from twoforone_tpu.data.molecules import Molecules
    from twoforone_tpu.data.pdb import load_pdb
    from twoforone_tpu.data.synthetic import (
        CHAIN10_TORSION_COMPONENTS,
        chain_trajectory,
    )
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.utils.artifacts import load_ema_params

    # The norm factor is a deterministic scalar (trainset std of the
    # seed-0 synthetic trajectory), but regenerating the 400k-frame
    # trajectory costs minutes of CPU per resume attempt — so it is
    # computed once per machine and cached; the cache is written only by
    # this same computation, never hand-edited.
    cache = os.path.join(_REPO, ".controls", "chain10_norm_factor.json")
    if os.path.exists(cache):
        with open(cache) as f:
            norm_factor = float(json.load(f)["norm_factor"])
    else:
        traj = chain_trajectory(400000, CHAIN10_TORSION_COMPONENTS, seed=0)
        topology = load_pdb(
            os.path.join(_REPO, "twoforone_tpu", "assets", "folded_pdbs",
                         "CLN025-0-c-alpha.pdb")
        ).topology
        trainset = CGDataset(traj[: int(0.7 * len(traj))], topology,
                             Molecules.CHIGNOLIN, mean0=True)
        norm_factor = float(trainset.data.std())
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        _atomic_json(cache, {"norm_factor": norm_factor,
                             "provenance": "build_chain10 (400k seed-0)"})

    model = GraphTransformer(
        num_beads=10, hidden_nf=64, n_layers=3,
        use_intrinsic_coords=True, use_abs_coords=False,
        use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(model=model, num_atoms=10, timesteps=1000,
                           norm_factor=norm_factor, loss_weights="ones")
    params = load_ema_params(gd, "chain10")
    if params is None and params_required:
        raise SystemExit("chain10 artifact not staged — run "
                         "scripts/chain10_control.py first")
    return gd, params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(_REPO, ".controls",
                                                 "paper_scale_run"))
    p.add_argument("--chains", type=int, default=100)
    p.add_argument("--steps", type=int, default=6_000_000)
    p.add_argument("--save_interval", type=int, default=500)
    # One segment = one checkpoint/stream/preemption boundary. 200k steps
    # =~ 1 TPU-minute at the measured ~4000 steps/s (docs/PERF_NOTES.md
    # round 4, parallel_sim=100), so a kill costs at most that.
    p.add_argument("--segment_steps", type=int, default=200_000)
    p.add_argument("--t_noise", type=int, default=20)     # chain10 preset
    p.add_argument("--temp", type=float, default=340.0)   # chignolin (K)
    args = p.parse_args()
    assert args.segment_steps % args.save_interval == 0
    assert args.steps % args.segment_steps == 0

    os.makedirs(args.out, exist_ok=True)
    state_path = os.path.join(args.out, "state.npz")
    meta_path = os.path.join(args.out, "meta.json")

    from twoforone_tpu.utils.cache import enable_compilation_cache
    from twoforone_tpu.utils.preempt import exit_if_preempted

    enable_compilation_cache()

    import jax

    from twoforone_tpu.data.molecules import default_dt_scale
    from twoforone_tpu.dynamics.langevin import LangevinDiffusion

    gd, params = build_chain10()

    # Chains initialize from the model's own i.i.d. samples — the
    # reference's langevin gen_mode (sample.py:176-214). Deterministic key
    # so a resumed run reconstructs the identical initial condition. On
    # resume the state checkpoint supersedes the initial condition anyway
    # (load_state below), so skip the 1000-step reverse chain entirely —
    # with deliberate mid-run kills every PER_TIMEOUT this saves a full
    # iid sampling pass (~2 min chip time) per relaunch. The persisted x
    # is in normalized units; scale back up since LangevinDiffusion
    # divides its init by norm_factor.
    if os.path.exists(state_path):
        init = np.asarray(np.load(state_path)["x"],
                          dtype=np.float32) * float(gd.norm_factor)
    else:
        init = np.asarray(gd.sample(params, args.chains,
                                    jax.random.PRNGKey(7)))

    dt_scale = default_dt_scale("CHIGNOLIN", 10)
    sim = LangevinDiffusion(
        gd, params, init,
        n_timesteps=args.steps, save_interval=args.save_interval,
        t=args.t_noise, temp_data=args.temp, temp_sim=args.temp,
        dt=None, masses=[12.0] * 10, friction=1.0, kb="consistent",
        random_seed=0, log=True, fused="auto", dt_scale=dt_scale,
    )

    meta = {"chains": args.chains, "steps": args.steps,
            "save_interval": args.save_interval,
            "segment_steps": args.segment_steps,
            "t_noise": args.t_noise, "temp": args.temp,
            "dt_scale": dt_scale, "integration_wall_s": 0.0,
            "resumes": 0, "segments_done": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
        meta["resumes"] += 1
    if os.path.exists(state_path):
        st = np.load(state_path, allow_pickle=True)
        sim.sim.load_state({
            "x": st["x"], "v": None if st["v"].ndim == 0 else st["v"],
            "t": int(st["t"]), "key": st["key"],
        })
        print(f"resumed at step {sim.sim._t} (resume #{meta['resumes']})")

    n_segments = args.steps // args.segment_steps
    # The segment cursor is the integrator state itself, never the meta
    # file: a crash between the state checkpoint and the meta update must
    # re-derive the next segment from t, or the wrong seg file would be
    # overwritten with the following segment's frames.
    while (seg := sim.sim._t // args.segment_steps) < n_segments:
        exit_if_preempted(f"paper-scale segment {seg}/{n_segments}")
        t0 = time.perf_counter()
        coords = sim.sim.simulate(sub_interval=args.segment_steps)
        elapsed = time.perf_counter() - t0
        # Stream this segment's frames (data units) before the state
        # checkpoint: a crash between the two re-runs the segment, which
        # overwrites the same file with identical frames (chunk-invariant
        # RNG), never duplicates them.
        seg_file = os.path.join(args.out, f"coords_seg{seg:03d}.npy")
        tmp = seg_file + ".tmp.npy"
        np.save(tmp, (coords * sim.norm_factor).astype(np.float32))
        os.replace(tmp, seg_file)
        st = sim.sim.state
        _atomic_savez(
            state_path, x=st["x"],
            v=np.zeros(()) if st["v"] is None else st["v"],
            t=st["t"], key=st["key"],
        )
        meta["segments_done"] = seg + 1  # informational; cursor is state t
        meta["integration_wall_s"] += elapsed
        _atomic_json(meta_path, meta)
        sps = args.segment_steps / elapsed
        print(f"segment {seg + 1}/{n_segments}: {elapsed:.1f}s "
              f"({sps:.0f} steps/s, {sps * args.chains:.0f} chain-steps/s), "
              f"total {meta['integration_wall_s']:.0f}s", flush=True)

    # ---- scoring (same contract as the control runs, at 24x the frames)
    from twoforone_tpu.data.synthetic import (
        CHAIN10_TORSION_COMPONENTS,
        chain_dataset,
        chain_trajectory,
    )
    from twoforone_tpu.evaluate.ergodicity import slow_torsion_ergodicity
    from twoforone_tpu.train.positive_control import SyntheticTicScorer

    frames = np.concatenate([
        np.load(os.path.join(args.out, f"coords_seg{s:03d}.npy"))
        for s in range(n_segments)
    ], axis=1)  # (chains, saves_total, beads, 3)
    assert frames.shape == (args.chains, args.steps // args.save_interval,
                            10, 3), frames.shape
    finite = np.isfinite(frames).all(axis=(1, 2, 3))
    scorer = SyntheticTicScorer(
        chain_trajectory(200000, CHAIN10_TORSION_COMPONENTS, seed=10),
        chain_dataset(50000, CHAIN10_TORSION_COMPONENTS, seed=11),
    )
    erg = slow_torsion_ergodicity(frames, CHAIN10_TORSION_COMPONENTS)
    total_steps = args.steps
    results = {
        "workload": f"{args.chains}x{args.steps} si{args.save_interval}",
        "frames_saved": int(frames.shape[0] * frames.shape[1]),
        "nonfinite_chain_frac": float(1.0 - finite.mean()),
        "tic_js_langevin": scorer.tic_js(
            frames[finite].reshape(-1, 10, 3)),
        "langevin_min_hop_fraction": erg["min_hop_fraction"],
        "langevin_max_occupancy_error": erg["max_occupancy_error"],
        "langevin_ergodic": erg["ergodic"],
        # The r4 verdict's "typical chain never hops in 50k steps" gap:
        # at 6M steps the MEDIAN chain should cross every slow torsion.
        "min_median_hops_per_chain": min(
            (s["median_hops_per_chain"] for s in erg["per_torsion"].values()),
            default=None,
        ),
        "integration_wall_s": round(meta["integration_wall_s"], 1),
        "steps_per_s": round(total_steps / meta["integration_wall_s"], 1),
        "chain_steps_per_s": round(
            total_steps * args.chains / meta["integration_wall_s"], 1),
        "resumes": meta["resumes"],
        "dt_scale": dt_scale, "t_noise": args.t_noise,
    }
    _atomic_json(os.path.join(args.out, "results.json"), results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
