"""Positive control: the full train -> sample -> evaluate stack must LEARN.

Trains a diffusion model through the complete :class:`Trainer` path on a
synthetic 5-bead system with an exactly known 4-basin torsion distribution
(data/synthetic.py), then holds the trained model to absolute accuracy bars:

- i.i.d. samples (full T=1000 reverse chain) must reproduce the phi/psi
  distribution: dihedral JS vs. the generator < 0.05 (the level the
  reference's trained ala2 models reach on real data —
  evaluate/evaluators_CGflowmatching.py JS scale).
- Langevin samples from the extracted force field (noise level t) must do
  the same — validating the score->force->BAOAB pipeline end to end.
- bf16 score-net Langevin must match f32 at distribution level (the claim
  behind bench.py's bf16 headline).

Used by tests/test_positive_control.py (CPU, slow lane) and
scripts/positive_control.py (TPU, larger budget).

Timestep weighting: the control trains with ``loss_weights="ones"`` (the
reference's default, main_train.py) rather than the shipped-model
``higheruntil_100``. The latter undersamples high-noise timesteps 9:1; the
early reverse chain (which decides basin membership) then carries a
persistent basin-weight bias that caps the i.i.d. dihedral JS around 0.07-0.09
regardless of training budget (measured, docs/POSITIVE_CONTROL.md). Uniform
weighting removes that cap; the Langevin force field at low t is trained at
uniform rate either way.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from twoforone_tpu.data.datasets import CGDataset
from twoforone_tpu.data.pdb import load_pdb
from twoforone_tpu.data.synthetic import bimodal_dipeptide_dataset
from twoforone_tpu.evaluate.metrics import get_prob, get_torsions, js_divergence

_ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def _cached_stage(results_folder, name, compute, resume):
    """Post-training stage cache: the iid-sample and Langevin stages are the
    expensive tail of a production control (tens of TPU-minutes at N>=35).
    Crash-resilient relaunches (resume=True) must not redo a completed
    stage, so each stage persists its raw product in the stable
    results_folder and is skipped when the file already exists.

    ``name`` must encode every knob that defines the stage's output (e.g.
    the Langevin stage is ``langevin_t{t}_dt{scale}``): the cache is keyed
    by filename, so a knob left out of the name would let a resumed run
    silently reuse a trajectory generated at the old settings while
    results.json records the new ones (round-4 advisor finding).

    Stage boundaries are also lossless bench-preemption points: everything
    before this stage is already persisted (utils/preempt protocol).
    """
    from twoforone_tpu.utils.preempt import exit_if_preempted

    path = os.path.join(results_folder, f"post_{name}.npy")
    if resume and os.path.exists(path):
        print(f"post-train stage '{name}': loaded from {path}")
        return np.load(path)
    exit_if_preempted(f"post-train stage '{name}'")
    arr = np.asarray(compute())
    tmp = path + ".tmp.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)
    return arr


def _segmented_langevin_stage(ld, results_folder, name, resume,
                              segment_steps=None):
    """The Langevin stage under the :func:`_cached_stage` contract
    (``post_{name}.npy``), driven in checkpointed segments
    (dynamics/segmented.py): a crash or bench preemption mid-stage costs
    one segment (~minutes), not the whole stage (up to ~1 h at N=56)."""
    from twoforone_tpu.dynamics.segmented import cleanup, segmented_sample

    path = os.path.join(results_folder, f"post_{name}.npy")
    if resume and os.path.exists(path):
        print(f"post-train stage '{name}': loaded from {path}")
        return np.load(path)
    arr = segmented_sample(ld, results_folder, name,
                           segment_steps=segment_steps, resume=resume)
    tmp = path + ".tmp.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)
    cleanup(results_folder, name)
    return arr


def dihedral_js(coords_a, coords_b, n_bins: int = 61) -> float:
    """JS between the 2D phi/psi histograms of two conformation sets."""
    pa = get_prob(get_torsions(coords_a), n_bins=n_bins)
    pb = get_prob(get_torsions(coords_b), n_bins=n_bins)
    return float(js_divergence(pa, pb))


def pwd_js(coords_a, coords_b, n_bins: int = 100) -> float:
    """JS between pooled pairwise-distance histograms (1D)."""

    def pwd(c):
        c = np.asarray(c)
        d = np.linalg.norm(c[:, :, None, :] - c[:, None, :, :], axis=-1)
        iu = np.triu_indices(c.shape[1], k=1)
        return d[:, iu[0], iu[1]].ravel()

    da, db = pwd(coords_a), pwd(coords_b)
    lo, hi = 0.0, max(da.max(), db.max()) * 1.05
    ha = np.histogram(da, bins=n_bins, range=(lo, hi))[0]
    hb = np.histogram(db, bins=n_bins, range=(lo, hi))[0]
    return float(js_divergence(ha, hb))


class SyntheticTicScorer:
    """TIC-JS scoring for the synthetic 10-bead system, with exactly the
    TicEvaluator conventions (sliding 4-mer dihedrals + PWD triu features,
    TICA(lagtime=100, dim=2) fit on a reference trajectory, 101-bin 2D
    density histograms, JS on flattened probabilities)."""

    def __init__(self, ref_trajectory, ref_equilibrium, bins: int = 101):
        from twoforone_tpu.evaluate.evaluators import (
            pwd_triu_batch,
            sliding_dihedral_indices,
        )
        from twoforone_tpu.evaluate.tica import fit_tica
        from twoforone_tpu.ops.geometry import dihedrals as jnp_dihedrals

        def feats(xyz):
            xyz = np.asarray(xyz)
            ind = sliding_dihedral_indices(xyz.shape[1])
            dihe = np.asarray(jnp_dihedrals(xyz, ind))
            return np.hstack((dihe, np.asarray(pwd_triu_batch(xyz))))

        self._feats = feats
        self.tica = fit_tica(feats(ref_trajectory), lagtime=100, dim=2)
        z = self.tica(feats(ref_equilibrium))
        self.gt_prob, self.ex, self.ey = np.histogram2d(
            z[:, 0], z[:, 1], bins=bins, density=True
        )

    def tic_js(self, xyz) -> float:
        from twoforone_tpu.evaluate.metrics import js_divergence

        z = self.tica(self._feats(xyz))
        prob, _, _ = np.histogram2d(
            z[:, 0], z[:, 1], bins=[self.ex, self.ey], density=True
        )
        if not np.isfinite(prob).any() or prob.sum() == 0:
            # every sample fell outside the reference bin range (possible
            # for a wildly wrong model): report maximal divergence, not NaN
            return float(np.log(2))
        return float(js_divergence(self.gt_prob.flatten(), prob.flatten()))


def physics_bars_ok(results: dict) -> bool:
    """The staged-artifact physics contract, as one predicate.

    Exactly the bars tests/test_trained_artifacts.py asserts on every
    staged ``assets/trained/chain{N}/results.json``; staging tooling
    (scripts/chain10_control.py) gates on this so a launcher cannot stage
    an artifact the test suite would reject.
    """
    return (
        results["nonfinite_frac_iid"] == 0.0
        and results["nonfinite_frac_langevin"] == 0.0
        and results["tic_js_iid"] <= results["tic_js_floor"] + 0.02
        and results["tic_js_langevin"] <= 0.10
        and results["pwd_js_iid"] <= 0.01
        and ergodicity_bars_ok(results)
    )


def ergodicity_bars_ok(results: dict) -> bool:
    """Basin-exchange bar shared by both staging gates and the staged-artifact
    tests (tests/test_ergodicity.py) — gate and test must assert the SAME
    contract, or a launcher could stage an artifact the suite rejects
    (round-4 advisor finding). Thresholds are the measured-green levels of
    the staged artifacts (chain35: hop 0.153/occ 0.072; chain56: 0.146/0.069),
    not the vacuous ``> 0`` the report's own ``ergodic`` field uses
    (evaluate/ergodicity.py — kept as a necessary condition there).
    Artifacts staged before the ergodicity report existed record none of
    these keys and pass vacuously.
    """
    return (
        results.get("langevin_ergodic", True)
        and results.get("langevin_min_hop_fraction", 1.0) >= 0.10
        and results.get("langevin_max_occupancy_error", 0.0) <= 0.10
    )


#: Per-size production-control settings: (PDB topology, Molecules entry,
#: model shape + optimizer from the reference's shipped configs
#: (SURVEY "shipped model config"), Langevin noise level + temperature from
#: evaluate/sampling_commands.md / dynamics/langevin.py temp tables).
CHAIN_CONTROL_PRESETS = {
    10: dict(pdb="CLN025-0-c-alpha.pdb", mol="CHIGNOLIN", hidden_nf=64,
             n_layers=3, learning_rate=4e-4, t_noise=20, temp=340.0,
             n_slow=2, components_seed=None),  # None = CHAIN10 fixture
    20: dict(pdb="2JOF-0-c-alpha.pdb", mol="TRP_CAGE", hidden_nf=128,
             n_layers=3, learning_rate=4e-4, t_noise=15, temp=290.0,
             n_slow=4, components_seed=11),
    # bba/1FME (28 CA beads): upper end of the clx fused-path regime
    # (CLX_MAX_N=32); the shipped bba config is the one production shape
    # with hidden_nf=96 among the fast folders.
    28: dict(pdb="1FME-0-c-alpha.pdb", mol="BBA", hidden_nf=96,
             n_layers=3, learning_rate=4e-4, t_noise=5, temp=325.0,
             n_slow=4, components_seed=14),
    # villin/2F4K (35 CA beads): the size regime where fused="auto" resolves
    # to the plain-XLA geometric force path (the fastest measured option
    # there, docs/PERF_NOTES.md) — so this control physics-validates the
    # third and last production force path with trained weights.
    35: dict(pdb="2F4K-0-c-alpha.pdb", mol="VILLIN", hidden_nf=128,
             n_layers=3, learning_rate=4e-4, t_noise=5, temp=360.0,
             n_slow=4, components_seed=12),
    # protein G / NuG2 (56 CA beads, the largest shipped system; XLA
    # geometric force path). The shipped protein_g config trains at batch
    # 256 (SURVEY "shipped model config"), carried in the preset.
    56: dict(pdb="NuG2-0-c-alpha.pdb", mol="PROTEIN_G", hidden_nf=128,
             n_layers=3, learning_rate=4e-4, t_noise=5, temp=350.0,
             n_slow=5, components_seed=13, batch_size=256),
}


def run_chain_control(
    n_beads: int = 10,
    train_iter: int = 50000,
    n_data: int = 400000,
    batch_size: int = None,
    hidden_nf: int = None,
    n_layers: int = None,
    learning_rate: float = None,
    num_samples: int = 50000,
    langevin_chains: int = 1000,
    langevin_steps: int = 50000,
    langevin_save_interval: int = 250,
    t_noise: int = None,
    langevin_dt_scale: float = None,
    seed: int = 0,
    results_folder: str = None,
    loss_weights: str = "ones",
    timesteps: int = 1000,
    fused: str = "never",
    eval_samples: int = 50000,
    eval_interval: int = None,
    resume: bool = False,
) -> dict:
    """Production-SCALE positive control at a shipped protein size: the
    reference's model shape for that protein trained at production scale on
    the synthetic ``n_beads``-bead multi-basin system (data/synthetic.py
    chain_*), scored with the TICA machinery the real fast-folder
    evaluation uses. Closes the VERDICT r2 gap "no trained model has been
    validated on a chignolin-shaped system with TIC-JS" within this image's
    data constraints (the D.E. Shaw trajectories are proprietary; the FU
    Berlin ala2 npz needs network egress — both absent). At n_beads=20 the
    Langevin stage with ``fused="auto"`` runs the clx fused attention-core
    path, validating its physics end to end.

    ``loss_weights`` defaults to "ones" for the reason documented in
    run_positive_control / docs/POSITIVE_CONTROL.md (the shipped
    higheruntil_100 undersamples high-noise timesteps and biases iid basin
    weights; the Langevin force field is unaffected either way).
    """
    import jax

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.data.pdb import load_pdb
    from twoforone_tpu.data.synthetic import (
        CHAIN10_TORSION_COMPONENTS,
        chain_dataset,
        chain_trajectory,
        make_chain_components,
    )
    from twoforone_tpu.dynamics.langevin import LangevinDiffusion
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.train.trainer import Trainer
    from twoforone_tpu.utils.config import TrainConfig

    from twoforone_tpu.data.molecules import Molecules

    preset = CHAIN_CONTROL_PRESETS[n_beads]
    hidden_nf = preset["hidden_nf"] if hidden_nf is None else hidden_nf
    n_layers = preset["n_layers"] if n_layers is None else n_layers
    learning_rate = (
        preset["learning_rate"] if learning_rate is None else learning_rate
    )
    t_noise = preset["t_noise"] if t_noise is None else t_noise
    if langevin_dt_scale is None:
        # Measured per-protein production default (data/molecules.py) —
        # the same table cli/sample.py resolves, so a control validates
        # exactly the knobs a production user gets.
        from twoforone_tpu.data.molecules import default_dt_scale

        langevin_dt_scale = default_dt_scale(preset["mol"], n_beads)
    temp = preset["temp"]
    if batch_size is None:
        batch_size = preset.get("batch_size", 512)
    if preset["components_seed"] is None:
        components = CHAIN10_TORSION_COMPONENTS
    else:
        components = make_chain_components(
            n_beads - 3, n_slow=preset["n_slow"],
            seed=preset["components_seed"],
        )
    chain10_dataset = lambda n, seed: chain_dataset(n, components, seed=seed)
    chain10_trajectory = lambda n, seed: chain_trajectory(
        n, components, seed=seed
    )

    traj = chain10_trajectory(n_data, seed=seed)
    topology = load_pdb(
        os.path.join(_ASSETS, "folded_pdbs", preset["pdb"])
    ).topology
    n_train = int(0.7 * n_data)
    n_val = int(0.1 * n_data)
    mol = Molecules[preset["mol"]]
    mk = lambda arr: CGDataset(arr, topology, mol, mean0=True)
    trainset = mk(traj[:n_train])
    valset = mk(traj[n_train : n_train + n_val])
    testset = mk(traj[n_train + n_val :])

    if results_folder is None:
        results_folder = tempfile.mkdtemp(prefix=f"chain{n_beads}_control_")

    norm_factor = float(trainset.data.std())
    model = GraphTransformer(
        num_beads=n_beads, hidden_nf=hidden_nf, n_layers=n_layers,
        use_intrinsic_coords=True, use_abs_coords=False,
        use_distances=False, conservative=True,
    )
    gd = GaussianDiffusion(
        model=model, num_atoms=n_beads, timesteps=timesteps,
        norm_factor=norm_factor, loss_weights=loss_weights,
    )
    cfg = TrainConfig(
        mol=preset["mol"].lower(),
        data_folder=None,
        results_folder=results_folder,
        tensorboard_folder=os.path.join(results_folder, "runs"),
        experiment_name=f"chain{n_beads}_control",
        hidden_features_gnn=hidden_nf,
        num_layers_gnn=n_layers,
        diffusion_steps=timesteps,
        loss_weights=loss_weights,
        conservative=True,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        batch_size=batch_size,
        learning_rate=learning_rate,
        min_lr_cosine_anneal=1e-5,
        train_iter=train_iter,
        # Default: no mid-train eval (final save still runs). Long TPU runs
        # pass eval_interval (+ resume=True with a stable results_folder) so
        # a worker crash resumes from the last milestone instead of
        # retraining from scratch (tunneled TPU fleets do go down mid-run).
        eval_interval=eval_interval or train_iter,
        start_from_last_saved=resume,
        # One full pass over the val split per eval (~156 batches at the
        # control data sizes). The default 5 passes made each mid-train
        # eval ~20 TPU-minutes at N=56 — longer than the 10k training
        # steps between evals — for a best-val estimator that one 40k-sample
        # pass already resolves.
        iterations_on_val=1,
        log_tensorboard_interval=500,
        steps_per_host_loop=50,
        num_samples=min(2048, num_samples),
        num_samples_final_eval=min(2048, num_samples),
        eval_langevin=False,
        seed=seed,
    )
    trainer = Trainer(gd, (trainset, valset, testset), preset["mol"].lower(),
                      cfg, use_tensorboard=False, evaluators=False)
    trainer.train()
    trainer.save("final")

    cached = lambda name, compute: _cached_stage(
        results_folder, name, compute, resume
    )

    # TICA scorer: fit on an independent reference trajectory, gt histogram
    # from i.i.d. equilibrium draws.
    scorer = SyntheticTicScorer(
        chain10_trajectory(min(n_data, 200000), seed=seed + 10),
        chain10_dataset(eval_samples, seed=seed + 11),
    )
    floor = scorer.tic_js(chain10_dataset(eval_samples, seed=seed + 12))

    iid = cached("iid", lambda: trainer.sample(num_samples))
    finite = np.isfinite(iid).all(axis=(1, 2))
    iid = iid[finite]
    results = {
        "tic_js_floor": floor,
        "tic_js_iid": scorer.tic_js(iid),
        "pwd_js_iid": pwd_js(iid, chain10_dataset(min(num_samples, 50000),
                                                  seed=seed + 13)),
        "nonfinite_frac_iid": float(1.0 - finite.mean()),
        "val_loss": trainer.best_val_loss,
    }

    ema_params = jax.device_get(trainer.state.ema_params)
    rng = np.random.default_rng(seed + 3)
    init = iid[rng.integers(0, len(iid), langevin_chains)]
    sim = LangevinDiffusion(
        gd, ema_params, init,
        n_timesteps=langevin_steps,
        save_interval=langevin_save_interval,
        t=t_noise, temp_data=temp, temp_sim=temp,
        dt=None, masses=[12.0] * n_beads, friction=1.0,
        # log=True: per-save-interval progress prints — the crash-resilient
        # launcher watches log liveness to tell a slow Langevin stage from a
        # wedged TPU RPC (a silent 25-minute stage is indistinguishable).
        kb="consistent", random_seed=seed, log=True, fused=fused,
        dt_scale=langevin_dt_scale,
    )
    # Stage name encodes the knobs that define the trajectory, so a resumed
    # run with retuned t/dt_scale (or an extended step budget — the hop
    # fraction the ergodicity bar asserts is window-length-dependent)
    # recomputes instead of mislabeling a cached trajectory (round-4
    # advisor finding).
    traj_lang = _segmented_langevin_stage(
        sim, results_folder,
        f"langevin_t{t_noise}_dt{langevin_dt_scale:g}_s{langevin_steps}",
        resume,
    )
    finite_l = np.isfinite(traj_lang).all(axis=(1, 2))
    results["nonfinite_frac_langevin"] = float(1.0 - finite_l.mean())
    if finite_l.all():
        # Basin-exchange (ergodicity) report on the chain-major trajectory
        # — the stationary TIC-JS bar below cannot see frozen chains
        # because they are iid-initialized (evaluate/ergodicity.py).
        # Informational: recorded in results.json, asserted by tests only
        # when present. Skipped when any frame is non-finite (the run
        # fails the bars then anyway, and NaN angles poison the labels).
        from twoforone_tpu.evaluate.ergodicity import slow_torsion_ergodicity

        erg = slow_torsion_ergodicity(
            traj_lang.reshape(langevin_chains, -1, n_beads, 3), components
        )
        results["langevin_min_hop_fraction"] = erg["min_hop_fraction"]
        results["langevin_max_occupancy_error"] = erg["max_occupancy_error"]
        results["langevin_ergodic"] = erg["ergodic"]
    traj_lang = traj_lang[finite_l]
    results["tic_js_langevin"] = scorer.tic_js(traj_lang)
    results["t_noise_langevin"] = t_noise
    results["langevin_dt_scale"] = langevin_dt_scale
    # Provenance for the window-dependent ergodicity numbers: hop fraction
    # is "chains that crossed at least once in THIS window", so the window
    # must travel with the report.
    results["langevin_steps"] = langevin_steps
    results["langevin_chains"] = langevin_chains
    results["results_folder"] = results_folder
    return results


def run_chain10_control(**kwargs) -> dict:
    """The chignolin-scale (N=10) instance of :func:`run_chain_control`."""
    return run_chain_control(n_beads=10, **kwargs)


#: Production configuration for the staged ala2-analog artifact
#: (``assets/trained/ala5/``): the measured-green recipe of
#: docs/POSITIVE_CONTROL.md (js_iid lands AT the statistical floor,
#: Langevin 0.035 < 0.05). Model shape per the reference's ala2 family
#: (5 CG beads; mass 12.8, T=300 K are hardcoded in run_positive_control,
#: matching reference trainer.py:352 / dynamics/langevin.py temp table).
ALA5_CONTROL_PRESET = dict(
    train_iter=80000, n_data=200000, batch_size=1024,
    hidden_nf=64, n_layers=3, learning_rate=6e-4,
    num_samples=40000, langevin_chains=256, langevin_steps=30000,
    langevin_save_interval=100, t_noise=15,
)


def dipeptide_bars_ok(results: dict) -> bool:
    """Staged-artifact physics contract for the ala2-analog (dihedral-JS)
    control — the dihedral-family counterpart of :func:`physics_bars_ok`.
    Exactly the bars tests/test_trained_artifacts.py asserts on a staged
    ``assets/trained/ala5/results.json``."""
    return (
        results["nonfinite_frac_iid"] == 0.0
        and results.get("nonfinite_frac_langevin", 1.0) == 0.0
        and results["js_iid"] <= results["js_floor"] + 0.02
        and results["js_langevin_f32"] <= 0.05
        and results["pwd_js_iid"] <= 0.01
        # bf16 force path must be distribution-level indistinguishable
        # from f32 (the claim behind the bf16 production defaults); when
        # the comparison was run, hold it to the measured-floor level.
        and results.get("js_bf16_vs_f32", 0.0) <= 0.02
        and ergodicity_bars_ok(results)
    )


def run_positive_control(
    train_iter: int = 4000,
    n_data: int = 40000,
    batch_size: int = 256,
    hidden_nf: int = 48,
    n_layers: int = 2,
    learning_rate: float = 2e-3,
    num_samples: int = 8192,
    langevin_chains: int = 128,
    langevin_steps: int = 20000,
    langevin_save_interval: int = 100,
    t_noise: int = 15,
    seed: int = 0,
    results_folder: str = None,
    bf16_compare: bool = True,
    phi_components=None,
    psi_components=None,
    loss_weights: str = "ones",
    n_bins: int = 61,
    final_eval_samples: int = None,
    timesteps: int = 1000,
    eval_interval: int = None,
    resume: bool = False,
    langevin_dt_scale: float = 1.0,
    log_langevin: bool = False,
) -> dict:
    """Run the whole control experiment; returns the metric dict.

    ``eval_interval``/``resume`` give the same crash resilience as
    :func:`run_chain_control` (mid-train checkpoint milestones + cached
    post-train stages) for production staging runs on the tunneled TPU.
    """
    import jax

    from twoforone_tpu.core.diffusion import GaussianDiffusion
    from twoforone_tpu.dynamics.langevin import LangevinDiffusion
    from twoforone_tpu.models.graph_transformer import GraphTransformer
    from twoforone_tpu.train.trainer import Trainer
    from twoforone_tpu.utils.config import TrainConfig

    from twoforone_tpu.data import synthetic

    mix = dict(
        phi_components=phi_components or synthetic.PHI_COMPONENTS,
        psi_components=psi_components or synthetic.PSI_COMPONENTS,
    )
    data = bimodal_dipeptide_dataset(n_data, seed=seed, **mix)
    topology = load_pdb(os.path.join(_ASSETS, "folded_pdbs", "ala2_cg.pdb")).topology
    n_train = int(0.7 * n_data)
    n_val = int(0.1 * n_data)
    mk = lambda arr: CGDataset(arr, topology, "alanine_fold1", mean0=True)
    trainset = mk(data[:n_train])
    valset = mk(data[n_train : n_train + n_val])
    testset = mk(data[n_train + n_val :])

    if results_folder is None:
        results_folder = tempfile.mkdtemp(prefix="positive_control_")

    norm_factor = float(trainset.data.std())
    model = GraphTransformer(
        num_beads=5,
        hidden_nf=hidden_nf,
        n_layers=n_layers,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        conservative=True,
    )
    gd = GaussianDiffusion(
        model=model,
        num_atoms=5,
        timesteps=timesteps,
        norm_factor=norm_factor,
        loss_weights=loss_weights,
    )
    cfg = TrainConfig(
        mol="alanine_dipeptide_fuberlin",
        data_folder=None,
        results_folder=results_folder,
        tensorboard_folder=os.path.join(results_folder, "runs"),
        experiment_name="positive_control",
        hidden_features_gnn=hidden_nf,
        num_layers_gnn=n_layers,
        diffusion_steps=timesteps,
        loss_weights=loss_weights,
        conservative=True,
        use_intrinsic_coords=True,
        use_abs_coords=False,
        use_distances=False,
        batch_size=batch_size,
        learning_rate=learning_rate,
        min_lr_cosine_anneal=learning_rate / 20,
        train_iter=train_iter,
        # Default: no mid-train eval (final_eval still runs); production
        # staging runs pass eval_interval + resume for crash resilience.
        eval_interval=eval_interval or train_iter,
        start_from_last_saved=resume,
        iterations_on_val=1,
        log_tensorboard_interval=100,
        num_samples=final_eval_samples or min(2048, num_samples),
        num_samples_final_eval=final_eval_samples or min(2048, num_samples),
        eval_langevin=False,
        seed=seed,
    )
    trainer = Trainer(gd, (trainset, valset, testset), "alanine", cfg, use_tensorboard=False)
    trainer.train()
    trainer.save("final")

    cached = lambda name, compute: _cached_stage(
        results_folder, name, compute, resume
    )

    # ---- i.i.d. samples through the full reverse chain (EMA weights)
    iid = cached("iid", lambda: trainer.sample(num_samples))
    finite = np.isfinite(iid).all(axis=(1, 2))
    nonfinite_frac = float(1.0 - finite.mean())
    iid = iid[finite]
    assert len(iid) > 0, "every i.i.d. sample was non-finite"
    reference = bimodal_dipeptide_dataset(num_samples, seed=seed + 1, **mix)
    floor_draw = bimodal_dipeptide_dataset(num_samples, seed=seed + 2, **mix)
    results = {
        "js_floor": dihedral_js(reference, floor_draw, n_bins=n_bins),
        "js_iid": dihedral_js(iid, reference, n_bins=n_bins),
        "pwd_js_iid": pwd_js(iid, reference),
        "pwd_js_floor": pwd_js(reference, floor_draw),
        # Fraction of reverse chains that blew up (clamped coords at the
        # ±1000 guard can still produce NaN forces at high t when the model
        # is unstable there); must be ~0 for a healthy model.
        "nonfinite_frac_iid": nonfinite_frac,
    }

    # ---- Langevin from the extracted force field. Chains initialize from
    # the model's own i.i.d. samples — the reference's langevin gen_mode
    # (sample.py:176-214) — so the metric reflects the model, not the data
    # it would otherwise be seeded with.
    ema_params = jax.device_get(trainer.state.ema_params)
    rng = np.random.default_rng(seed + 3)
    init = np.asarray(iid)[rng.integers(0, len(iid), langevin_chains)]

    def make_sim(bf16):
        return LangevinDiffusion(
            gd,
            ema_params,
            init,
            n_timesteps=langevin_steps,
            save_interval=langevin_save_interval,
            t=t_noise,
            temp_data=300,
            temp_sim=300,
            dt=None,
            masses=[12.8] * 5,
            friction=1.0,
            kb="consistent",
            random_seed=seed,
            log=log_langevin,
            bf16=bf16,
            dt_scale=langevin_dt_scale,
        )

    stage_suffix = f"_t{t_noise}_dt{langevin_dt_scale:g}_s{langevin_steps}"
    traj_f32 = _segmented_langevin_stage(
        make_sim(False), results_folder, f"langevin_f32{stage_suffix}",
        resume,
    )
    finite_l = np.isfinite(traj_f32).all(axis=(1, 2))
    results["nonfinite_frac_langevin"] = float(1.0 - finite_l.mean())
    if finite_l.all():
        # Basin-exchange report over phi/psi (see run_chain_control).
        from twoforone_tpu.evaluate.ergodicity import slow_torsion_ergodicity

        erg = slow_torsion_ergodicity(
            traj_f32.reshape(langevin_chains, -1, 5, 3),
            [mix["phi_components"], mix["psi_components"]],
        )
        results["langevin_min_hop_fraction"] = erg["min_hop_fraction"]
        results["langevin_max_occupancy_error"] = erg["max_occupancy_error"]
        results["langevin_ergodic"] = erg["ergodic"]
    traj_f32 = traj_f32[finite_l]
    results["js_langevin_f32"] = dihedral_js(traj_f32, reference, n_bins=n_bins)
    results["pwd_js_langevin_f32"] = pwd_js(traj_f32, reference)
    if bf16_compare:
        traj_bf16 = _segmented_langevin_stage(
            make_sim(True), results_folder, f"langevin_bf16{stage_suffix}",
            resume,
        )
        traj_bf16 = traj_bf16[np.isfinite(traj_bf16).all(axis=(1, 2))]
        results["js_langevin_bf16"] = dihedral_js(traj_bf16, reference, n_bins=n_bins)
        results["js_bf16_vs_f32"] = dihedral_js(traj_bf16, traj_f32, n_bins=n_bins)
        results["pwd_js_bf16_vs_f32"] = pwd_js(traj_bf16, traj_f32)
    results["t_noise_langevin"] = t_noise
    results["langevin_dt_scale"] = langevin_dt_scale
    # Window provenance for the ergodicity numbers (see run_chain_control).
    results["langevin_steps"] = langevin_steps
    results["langevin_chains"] = langevin_chains
    results["results_folder"] = results_folder
    return results
