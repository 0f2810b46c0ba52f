"""Backfill the basin-exchange (ergodicity) report for staged controls
that predate it.

chain10/chain20/chain35 were staged before results.json recorded
``langevin_min_hop_fraction`` / ``langevin_max_occupancy_error`` /
``langevin_ergodic`` (train/positive_control.py:431-445), so their
ergodicity contract tests skip (tests/test_ergodicity.py
"predates the ergodicity report"). This script re-runs ONLY the Langevin
stage of the control protocol on the staged EMA weights — identical
knobs, init protocol, and window as the original staging run — computes
the slow-torsion basin-exchange report, and:

- always writes the full report to ``docs/dynamics_chain{N}_backfill.json``
  (measurement first, verdict second);
- updates the staged ``results.json`` with the report fields + window
  provenance only when the measurement passes the staging-gate bars
  (``ergodicity_bars_ok``) — the gate==test-contract invariant means a
  red measurement must surface as a finding, not as a failing suite.

Chip cost: iid inits (1000 ancestral draws) + the 50k-step window
(~2 min at N=10, ~11 min at N=20, ~17 min at N=35). Segment-checkpointed
and bench-preemption-aware (dynamics/segmented.py), so it is safe under
``run_control_resilient.sh CONTROL_CMD=...``.

    python scripts/backfill_ergodicity.py --n_beads 10
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAINED = os.path.join(REPO, "twoforone_tpu", "assets", "trained")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_beads", type=int, required=True)
    p.add_argument("--chains", type=int, default=1000)
    p.add_argument("--steps", type=int, default=50000,
                   help="Langevin window (the original staging runs used 50k)")
    p.add_argument("--save_interval", type=int, default=250)
    p.add_argument("--fused", type=str, default="auto")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    n = args.n_beads

    import jax

    from scripts.ddim_quality import rebuild_control
    from twoforone_tpu.data.molecules import default_dt_scale
    from twoforone_tpu.dynamics.langevin import LangevinDiffusion
    from twoforone_tpu.evaluate.ergodicity import slow_torsion_ergodicity
    from twoforone_tpu.train.positive_control import (
        CHAIN_CONTROL_PRESETS,
        _segmented_langevin_stage,
        ergodicity_bars_ok,
    )

    res_path = os.path.join(TRAINED, f"chain{n}", "results.json")
    with open(res_path) as f:
        staged = json.load(f)

    preset = CHAIN_CONTROL_PRESETS[n]
    # The knobs THE STAGED TRAJECTORY ran at: recorded values when present,
    # else the same defaults the original run resolved (preset t_noise,
    # measured production dt_scale table).
    t_noise = int(staged.get("t_noise_langevin", preset["t_noise"]))
    dt_scale = float(
        staged.get("langevin_dt_scale", default_dt_scale(preset["mol"], n))
    )
    print(f"chain{n}: t={t_noise} dt_scale={dt_scale} window={args.steps}"
          f" x {args.chains} chains", flush=True)

    gd, params, comp = rebuild_control(n)

    # Init protocol of run_chain_control: i.i.d. draws from the trained
    # model itself (full ancestral chain), one init per Langevin chain.
    t0 = time.time()
    draws = []
    key = jax.random.PRNGKey(args.seed + 3)
    batch = min(512, args.chains)
    while sum(len(d) for d in draws) < args.chains:
        key, sub = jax.random.split(key)
        x = np.asarray(gd.sample(params, batch, sub))
        draws.append(x[np.isfinite(x).all(axis=(1, 2))])
        print(f"  iid inits {sum(len(d) for d in draws)}/{args.chains}",
              flush=True)
    init = np.concatenate(draws)[: args.chains]
    print(f"  inits in {time.time() - t0:.1f}s", flush=True)

    sim = LangevinDiffusion(
        gd, params, init,
        n_timesteps=args.steps,
        save_interval=args.save_interval,
        t=t_noise, temp_data=preset["temp"], temp_sim=preset["temp"],
        dt=None, masses=[12.0] * n, friction=1.0,
        kb="consistent", random_seed=args.seed, log=True, fused=args.fused,
        dt_scale=dt_scale,
    )
    folder = os.path.join(REPO, ".controls", f"ergodicity_backfill_chain{n}")
    os.makedirs(folder, exist_ok=True)
    traj = _segmented_langevin_stage(
        sim, folder, f"langevin_t{t_noise}_dt{dt_scale:g}_s{args.steps}",
        resume=True,
    )
    traj = traj.reshape(args.chains, -1, n, 3)
    finite = bool(np.isfinite(traj).all())
    erg = slow_torsion_ergodicity(traj, comp) if finite else None

    report = {
        "n_beads": n,
        "knobs": {"t_noise": t_noise, "dt_scale": dt_scale,
                  "steps": args.steps, "chains": args.chains,
                  "save_interval": args.save_interval, "seed": args.seed},
        "finite": finite,
        "ergodicity": erg,
        "provenance": "backfill on staged EMA weights "
                      "(scripts/backfill_ergodicity.py); original staging "
                      "run predates the report fields",
    }
    doc_path = os.path.join(REPO, "docs", f"dynamics_chain{n}_backfill.json")
    with open(doc_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {doc_path}", flush=True)

    if not finite:
        print(f"VERDICT chain{n}: NON-FINITE frames, results.json untouched",
              flush=True)
        return
    candidate = dict(staged)
    candidate["langevin_min_hop_fraction"] = erg["min_hop_fraction"]
    candidate["langevin_max_occupancy_error"] = erg["max_occupancy_error"]
    candidate["langevin_ergodic"] = erg["ergodic"]
    candidate.setdefault("t_noise_langevin", t_noise)
    candidate.setdefault("langevin_dt_scale", dt_scale)
    candidate["langevin_steps"] = args.steps
    candidate["langevin_chains"] = args.chains
    candidate["ergodicity_backfill"] = os.path.basename(doc_path)
    if ergodicity_bars_ok(candidate):
        tmp = res_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(candidate, f, indent=2)
        os.replace(tmp, res_path)
        print(f"VERDICT chain{n}: GREEN (hop {erg['min_hop_fraction']:.3f}, "
              f"occ {erg['max_occupancy_error']:.3f}) — results.json updated",
              flush=True)
    else:
        print(f"VERDICT chain{n}: RED (hop {erg['min_hop_fraction']:.3f}, "
              f"occ {erg['max_occupancy_error']:.3f}) — results.json "
              "untouched; see the backfill report", flush=True)


if __name__ == "__main__":
    main()
