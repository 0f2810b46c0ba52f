"""Evaluation suite: dihedral / PWD / TICA / RMSD / contact metrics.

Capability-parity redesign of reference evaluate/evaluators.py. Metric
numerics are identical (same histogram definitions, same JS), heavy geometry
(dihedrals, pairwise distances, Kabsch RMSD) runs as jnp ops instead of
mdtraj, and golden references load from the packaged assets.

Latent bugs in the reference are fixed, not replicated:
- ``TicEvaluator.eval`` returned an unbound ``fig`` when ``plot_tic=False``
  (reference evaluate/evaluators.py:488-500) — here it returns None.
- ``ContactEvaluator._plot_contact_normcount`` returned an unbound variable
  when ``take_log=False`` (reference :807-827) — here it returns the min of
  what was plotted.
- ``PwdEvaluator._plot_pwds`` depended on ``self.gt_pwd_triu`` existing only
  on the no-golden path (reference :238, :293) — here the ground-truth
  distances are computed on demand.
- ``np.histogram2d(..., normed=True)`` (reference :410-416) uses the kwarg
  removed in numpy >= 1.24 — here ``density=True``.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Optional

import numpy as np

from twoforone_tpu.data.molecules import (
    FOLDED_PDB_DIR,
    Molecules,
    SAVED_REFERENCES_DIR,
)
from twoforone_tpu.data.pdb import process_pdb
from twoforone_tpu.evaluate.deeptime_compat import (
    load_pwd_reference,
    load_tica_reference,
)
from twoforone_tpu.evaluate.metrics import (
    K_BT_IN_KCAL_PER_MOL,
    free_energy_mse,
    get_prob,
    get_torsions,
    js_divergence,
    kl_div_density,
)
from twoforone_tpu.evaluate.tica import TicaProjection, fit_tica
from twoforone_tpu.ops.geometry import (
    dihedrals as jnp_dihedrals,
    kabsch_rmsd,
    pairwise_distances,
    pwd_triu_batch,
    sliding_dihedral_indices,
)


def _as_coords(data) -> Optional[np.ndarray]:
    """Accept CGDataset / array-like; return (frames, N, 3) numpy or None."""
    if data is None:
        return None
    if hasattr(data, "is_empty"):
        return None if data.is_empty else np.asarray(data.data)
    arr = np.asarray(data)
    return arr if arr.size else None


class Evaluator:
    """Orchestrating evaluator used in training and main eval
    (reference evaluate/evaluators.py:28-111).

    Dispatch per molecule: ala2 -> dihedral JS; fast folders -> TIC JS + PWD
    JS; protein_g -> neither in-loop (reference :63-77, :93-99).
    """

    def __init__(
        self,
        ref_data,
        topology,
        mol_name: str = "alanine",
        eval_folder: Optional[str] = None,
        folded_pdb_folder: str = FOLDED_PDB_DIR,
        data_folder: Optional[str] = None,
        evalsetname: str = "",
    ):
        self.ref_data = _as_coords(ref_data)
        self.topology = topology
        self.eval_folder = eval_folder
        self.folded_pdb_folder = folded_pdb_folder
        self.mol_name = mol_name

        # NB: the reference passes ``evalsetname=`` to sub-evaluators whose
        # kwarg is ``evalset`` (evaluate/evaluators.py:71, :76 vs :222, :362),
        # so constructing a fast-folder Evaluator crashes there as shipped.
        # Fixed here: empty evalsetname falls back to "testset".
        evalset = evalsetname or "testset"
        self.tic = None
        if "alanine" in mol_name:
            self.dihedral_evaluator = DihedralEnergiesEvaluator(
                self.ref_data, topology, self.eval_folder
            )
        elif mol_name.lower() != "protein_g":
            try:
                self.tic = TicEvaluator(
                    self.ref_data,
                    mol_name,
                    eval_folder=self.eval_folder,
                    data_folder=data_folder,
                    folded_pdb_folder=folded_pdb_folder,
                    evalset=evalset,
                )
            except ValueError:
                # Data-free mode for a fast folder with no shipped golden
                # TICA pickle (the reference ships them only for chignolin
                # and trp_cage): skip the TIC metric instead of making the
                # whole Evaluator unusable — PWD-JS still runs below via
                # its offset-3 golden-pickle fallback.
                if self.ref_data is not None:
                    raise
                print(
                    f"Evaluator: no reference data and no golden TICA pickle "
                    f"for {mol_name}; skipping the TIC metric (PWD only)"
                )
        if mol_name.lower() != "protein_g":
            self.pwd_evaluator = PwdEvaluator(
                self.ref_data, self.eval_folder, mol_name, evalset=evalset
            )

    def eval(self, sampled_mol, milestone, save_plots: bool = False) -> dict:
        sampled_mol = np.asarray(sampled_mol)
        dict_results = {}
        if "alanine" in self.mol_name:
            print(f"Dihedral analysis {milestone}")
            _, dihedral_js, _, _ = self.dihedral_evaluator.eval(
                sampled_mol, save_plots, milestone
            )
            dict_results["Dihedral JS"] = dihedral_js
        elif self.tic is not None:
            print(f"TIC analysis {milestone}")
            dict_results["TIC JS"] = self.tic.eval(
                sampled_mol, title=f"tic_{milestone}", plot_tic=save_plots
            )[0]
        if self.mol_name.lower() != "protein_g":
            print(f"PWD Analysis {milestone}")
            dict_results["PWD JS"] = self.pwd_evaluator.eval(sampled_mol)

        for key in dict_results:
            print(key + f": {dict_results[key]:.4f}")
        if self.eval_folder is not None:
            with open(os.path.join(self.eval_folder, f"results-{milestone}.json"), "w") as f:
                json.dump(dict_results, f)
        print("Evaluation done \n")
        return dict_results


class DihedralEnergiesEvaluator:
    """Dihedral (Ramachandran) free-energy evaluator for ala2
    (reference evaluate/evaluators.py:114-199)."""

    def __init__(
        self,
        val_data=None,
        topology=None,
        plots_folder: Optional[str] = None,
        n_bins: int = 61,
        saved_ref: Optional[str] = None,
    ):
        self.topology = topology
        self.plots_folder = plots_folder
        self.n_bins = n_bins
        if saved_ref is None:
            saved_ref = os.path.join(
                SAVED_REFERENCES_DIR, "saved_dih_probs_ala2_testset.pickle"
            )
        val_data = _as_coords(val_data)
        if val_data is not None:
            # Real reference data available: score against it directly
            # (matches the reference's in-training behavior, where the
            # relative golden path does not resolve from the repo root).
            t0_dihe = get_torsions(val_data)
            self.gt_probs = get_prob(t0_dihe, n_bins=self.n_bins)
        elif os.path.exists(saved_ref):
            with open(saved_ref, "rb") as f:
                self.gt_probs = pickle.load(f)
        else:
            raise ValueError(
                "DihedralEnergiesEvaluator needs reference data or a golden pickle"
            )

    def eval(self, all_mol, plot_freeE=False, milestone=0,
             plot_title="Ramachandran plot", save_plot=True):
        t0_dihe = get_torsions(np.asarray(all_mol))
        probs = get_prob(t0_dihe, n_bins=self.n_bins)
        dihedral_mse = free_energy_mse(probs, self.gt_probs)
        dihedral_js = js_divergence(probs, self.gt_probs)
        kl_1 = kl_div_density(probs, self.gt_probs)
        kl_2 = kl_div_density(self.gt_probs, probs)
        if plot_freeE and self.plots_folder is not None:
            self._plot_freeE_2d(
                probs,
                os.path.join(self.plots_folder, f"ramachandran_sampled_{milestone}.png"),
                plot_title,
                save_plot,
            )
            self._plot_freeE_2d(
                self.gt_probs,
                os.path.join(self.plots_folder, "ramachandran_valid.png"),
                plot_title,
                save_plot,
            )
        return dihedral_mse, dihedral_js, kl_1, kl_2

    def _plot_freeE_2d(self, probs, file_name, plot_title="", save_plot=True):
        from twoforone_tpu.evaluate.plots import plot_free_energy_2d

        plot_free_energy_2d(probs, file_name, self.n_bins, plot_title, save_plot)


class PwdEvaluator:
    """Per-pair pairwise-distance histogram JS (reference
    evaluate/evaluators.py:202-337). Histograms use 0.1 Angstrom resolution
    with per-pair ranges set by the ground-truth maxima."""

    def __init__(
        self,
        val_data=None,
        plots_folder: str = "",
        mol_name: str = "",
        offset: int = 0,
        saved_ref: str = "none",
        evalset: str = "testset",
    ):
        self.offset = offset
        self.plots_folder = plots_folder
        self.mol_name = mol_name.lower()
        self.resolution = 0.1
        self.gt_pwd_triu = None

        defaulted_ref = saved_ref == "none"
        if defaulted_ref:
            saved_ref = os.path.join(
                SAVED_REFERENCES_DIR,
                f"saved_pwd_{mol_name.upper()}_{evalset}_offset_{self.offset}.pickle",
            )

        val_data = _as_coords(val_data)
        if val_data is not None:
            self.gt_pwd_triu = np.asarray(pwd_triu_batch(val_data, self.offset))
            self.gt_max = self.gt_pwd_triu.max(axis=0)
            self.gt_hist = []
            for pwd, m in zip(self.gt_pwd_triu.T, self.gt_max):
                nbins = int(m // self.resolution + 1)
                hist, _ = np.histogram(
                    pwd, bins=nbins, range=(0, self.resolution * nbins)
                )
                self.gt_hist.append(hist.astype(np.float64))
        else:
            # Data-free mode: the shipped golden pickles are offset-3 only
            # (saved_references/saved_pwd_*_offset_3.pickle, mirroring the
            # reference), but the orchestrating Evaluator constructs this
            # with the default offset=0 — the reference crashes there
            # (evaluate/evaluators.py:220-237 with no ./saved_references
            # offset-0 pickle). Fall back to the offset-3 pickle so fast
            # folders remain evaluable "in the absence of reference data"
            # (saved_references/README.md), adjusting self.offset so sampled
            # PWDs use the same pair set as the golden histograms.
            if not os.path.exists(saved_ref) and not defaulted_ref:
                # An explicitly requested pickle that is absent is a caller
                # error — silently scoring against a different pair set
                # would change the metric's definition under the caller
                # (round-4 advisor finding).
                raise FileNotFoundError(
                    f"PwdEvaluator: explicit saved_ref does not exist: "
                    f"{saved_ref}"
                )
            # The fallback below fires ONLY for the default construction
            # (saved_ref='none', offset=0 — what the orchestrating
            # Evaluator builds); an explicit non-zero offset keeps the
            # strict contract.
            if (
                not os.path.exists(saved_ref)
                and defaulted_ref
                and self.offset == 0
                and mol_name
            ):
                fallback = os.path.join(
                    SAVED_REFERENCES_DIR,
                    f"saved_pwd_{mol_name.upper()}_{evalset}_offset_3.pickle",
                )
                if os.path.exists(fallback):
                    print(
                        f"PwdEvaluator: no reference data and no offset-"
                        f"{self.offset} golden pickle; falling back to the "
                        f"shipped offset-3 pickle {os.path.basename(fallback)}"
                    )
                    self.offset = 3
                    saved_ref = fallback
            if os.path.exists(saved_ref):
                self.gt_max, self.gt_hist = load_pwd_reference(saved_ref)
            else:
                raise ValueError(
                    "PwdEvaluator needs reference data or a golden pickle"
                )

    def js_divergence_pwd(self, hist_gt, pwd_sampled, gt_max, resolution) -> float:
        if pwd_sampled.shape[1] != len(hist_gt):
            raise ValueError(
                f"PWD pair-count mismatch: samples have {pwd_sampled.shape[1]} "
                f"offset-{self.offset} pairs but the reference histograms have "
                f"{len(hist_gt)} — bead count of the samples does not match "
                f"the reference for '{self.mol_name}'"
            )
        result_js = np.empty(len(hist_gt))
        for i, (hgt, pwd, gtm) in enumerate(zip(hist_gt, pwd_sampled.T, gt_max)):
            maxval = max(float(gtm), float(pwd.max()))
            nbins = int(maxval // resolution + 1)
            hist_sampled, _ = np.histogram(
                pwd, bins=nbins, range=(0, resolution * nbins)
            )
            hgt = np.asarray(hgt, dtype=np.float64)
            if nbins > len(hgt):
                hgt = np.concatenate([hgt, np.zeros(nbins - len(hgt))])
            result_js[i] = js_divergence(hgt, hist_sampled)
        return float(result_js.mean())

    def eval(self, all_mol, plot_pwds=False, milestone=0) -> float:
        pwd_sampled = np.asarray(pwd_triu_batch(np.asarray(all_mol), self.offset))
        pwd_js = self.js_divergence_pwd(
            self.gt_hist, pwd_sampled, self.gt_max, self.resolution
        )
        if plot_pwds:
            from twoforone_tpu.evaluate.plots import plot_pwd_histograms

            assert self.gt_pwd_triu is not None, (
                "PWD histogram plot requires reference data (not just golden "
                "histograms)"
            )
            assert self.offset == 1, "Offset needs to be set to 1 for this plot"
            plot_pwd_histograms(
                self.gt_pwd_triu,
                pwd_sampled,
                os.path.join(self.plots_folder, f"PWDS_{self.mol_name}_DM_{milestone}.png"),
            )
        return pwd_js


class TicEvaluator:
    """TICA free-energy-surface JS for fast folders
    (reference evaluate/evaluators.py:340-605). Features = sliding 4-mer
    dihedrals + upper-triangle pairwise distances; TICA(lagtime=100, dim=2)."""

    def __init__(
        self,
        val_data=None,
        mol_name: str = "",
        eval_folder: Optional[str] = None,
        data_folder: Optional[str] = None,
        folded_pdb_folder: str = FOLDED_PDB_DIR,
        bins: int = 101,
        saved_ref: str = "none",
        evalset: str = "testset",
    ):
        self.mol_name = mol_name
        self.plots_folder = eval_folder
        self.bins = bins
        protid = Molecules[mol_name.upper()].value
        self.folded = process_pdb(os.path.join(folded_pdb_folder, f"{protid}.pdb"), mol_name)

        if saved_ref == "none":
            saved_ref = os.path.join(
                SAVED_REFERENCES_DIR, f"saved_TICA_{mol_name.upper()}_{evalset}.pickle"
            )

        if os.path.exists(saved_ref):
            (self.tica, self.gt_prob, self.bin_edges_x, self.bin_edges_y) = (
                load_tica_reference(saved_ref)
            )
        else:
            val_coords = _as_coords(val_data)
            if val_coords is None or data_folder is None:
                raise ValueError(
                    "TicEvaluator needs a golden pickle or (val data + data_folder)"
                )
            from twoforone_tpu.data.datasets import get_dataset

            trainset, valset, testset = get_dataset(
                mol_name, mean0=True, data_folder=data_folder,
                shuffle_before_splitting=False,
            )
            sorted_xyz = np.concatenate(
                [trainset.data, valset.data, testset.data], axis=0
            )
            # TIC eigenvalues fit on the full sorted trajectory, consistent
            # with previous works (reference evaluate/evaluators.py:399-404).
            self.tica = fit_tica(self.get_tic_features(sorted_xyz), lagtime=100, dim=2)
            transformed = self.tica(self.get_tic_features(val_coords))
            self.gt_prob, self.bin_edges_x, self.bin_edges_y = np.histogram2d(
                transformed[:, 0], transformed[:, 1], bins=self.bins, density=True
            )

        self.bin_mids_x = (self.bin_edges_x[1:] + self.bin_edges_x[:-1]) / 2
        self.bin_mids_y = (self.bin_edges_y[1:] + self.bin_edges_y[:-1]) / 2
        folded_transform = self.tica(self.get_tic_features(self.folded.xyz[None]))[0]
        self.bin_x_folded = int(np.argmin(abs(self.bin_mids_x - folded_transform[0])))
        self.bin_y_folded = int(np.argmin(abs(self.bin_mids_y - folded_transform[1])))

    def get_tic_features(self, xyz) -> np.ndarray:
        """Dihedrals over sliding 4-mers + PWD triu (reference :433-445)."""
        xyz = np.asarray(xyz)
        ind = sliding_dihedral_indices(xyz.shape[1])
        dihe = np.asarray(jnp_dihedrals(xyz, ind))
        pwds = np.asarray(pwd_triu_batch(xyz))
        return np.hstack((dihe, pwds))

    def eval(self, xyz_samples, title="", plot_tic=True, path=None, cmap="OrRd",
             gradient=True, steps=3, linewidth=2):
        feats = self.get_tic_features(np.asarray(xyz_samples))
        transformed = self.tica(feats)
        prob_samp, _, _ = np.histogram2d(
            transformed[:, 0],
            transformed[:, 1],
            bins=[self.bin_edges_x, self.bin_edges_y],
            density=True,
        )
        tic_js = js_divergence(self.gt_prob.flatten(), prob_samp.flatten())

        fig = None
        if plot_tic and self.plots_folder is not None:
            from twoforone_tpu.evaluate.plots import plot_tic_map

            file_name = os.path.join(
                self.plots_folder,
                f"TICA_{self.mol_name}_{title}{'_path' if path is not None else ''}.png",
            )
            fig = plot_tic_map(
                prob_samp, self.bin_mids_x, self.bin_mids_y,
                self.bin_x_folded, self.bin_y_folded, title, file_name,
                path=path, cmap=cmap, gradient=gradient, steps=steps,
                linewidth=linewidth,
            )
        return tic_js, fig


class RmsdEvaluator:
    """RMSD-to-native free-energy evaluator (reference
    evaluate/evaluators.py:608-732)."""

    cutoff_dict_ref = {
        "chignolin": 10,
        "trp_cage": 12,
        "bba": 14,
        "villin": 14,
        "protein_g": 20,
    }

    def __init__(self, mol_name: str, folded_pdb: Optional[str] = None,
                 eval_folder: Optional[str] = None):
        self.plots_folder = eval_folder
        if folded_pdb is None:
            protid = Molecules[mol_name.upper()].value
            folded_pdb = os.path.join(FOLDED_PDB_DIR, f"{protid}.pdb")
        self.folded = process_pdb(folded_pdb, mol_name)
        self.plot_dict = {}
        self.mol_name = mol_name
        self.saved_ref = os.path.join(
            SAVED_REFERENCES_DIR,
            f"saved_rmsd_{self.mol_name.upper()}_reference_total.pickle",
        )
        self.cutoff_ref = self.cutoff_dict_ref[mol_name.lower()]
        self.nbins_ref = 100

    def eval(self, method: str, xyz=None, nbins: int = 100,
             cutoff: Optional[float] = None, save_dynamics: bool = False):
        if method == "Reference" and xyz is None and os.path.exists(self.saved_ref):
            assert nbins == self.nbins_ref and cutoff == self.cutoff_ref, (
                f"Reference data only exists for nbins={self.nbins_ref} and "
                f"cutoff={self.cutoff_ref}"
            )
            with open(self.saved_ref, "rb") as f:
                self.plot_dict[method] = pickle.load(f)
            return self.plot_dict[method]

        xyz = np.asarray(xyz)
        self.plot_dict[method] = {}
        valid_mask = np.all(np.all(np.isfinite(xyz), -1), -1)
        rmsd = np.full(len(xyz), np.nan)
        rmsd[valid_mask] = np.asarray(
            kabsch_rmsd(xyz[valid_mask], self.folded.xyz)
        )
        if save_dynamics:
            self.plot_dict[method]["rmsd"] = rmsd
        if cutoff is None:
            cutoff = rmsd[~np.isnan(rmsd)].max()
        h, bin_edges = np.histogram(rmsd, bins=nbins, range=[0, cutoff], density=True)
        self.plot_dict[method]["bin_mids"] = (bin_edges[:-1] + bin_edges[1:]) / 2.0
        with np.errstate(divide="ignore"):
            self.plot_dict[method]["energies"] = -np.log(h)
        return self.plot_dict[method]

    def plot(self, save=True, **kwargs):
        from twoforone_tpu.evaluate.plots import plot_rmsd_free_energy

        return plot_rmsd_free_energy(
            self.plot_dict, self.mol_name, self.plots_folder, save=save, **kwargs
        )


class ContactEvaluator:
    """Contact-map evaluator (reference evaluate/evaluators.py:735-858):
    contacts = pairwise distance < cutoff (default 10 Angstrom)."""

    def __init__(self, mol_name: str, folded_pdb: Optional[str] = None,
                 eval_folder: Optional[str] = None, contact_cutoff: float = 10):
        self.mol_name = mol_name
        self.contact_cutoff = contact_cutoff
        self.plots_folder = eval_folder
        if folded_pdb is None:
            protid = Molecules[mol_name.upper()].value
            folded_pdb = os.path.join(FOLDED_PDB_DIR, f"{protid}.pdb")
        self.folded = process_pdb(folded_pdb, mol_name).xyz
        self.pwd_folded = np.asarray(pairwise_distances(self.folded))
        self.contacts_folded = self.pwd_folded < self.contact_cutoff

    def get_contacts(self, xyz_sampled) -> np.ndarray:
        pwd = np.asarray(pairwise_distances(np.asarray(xyz_sampled)))
        return pwd < self.contact_cutoff

    def normalized_contact_count(self, xyz_sampled) -> np.ndarray:
        contacts = self.get_contacts(xyz_sampled)
        return contacts.sum(axis=0) / len(contacts)

    def bce_dynamics(self, xyz_sampled) -> np.ndarray:
        """Per-frame binary cross entropy to the folded contact map
        (reference :829-858). Matches torch.nn.functional.binary_cross_entropy
        including its log clamp at -100."""
        contacts = self.get_contacts(xyz_sampled).astype(np.float64)
        n = self.contacts_folded.shape[-1]
        iu, ju = np.triu_indices(n, k=3)
        samp = contacts[:, iu, ju]
        target = self.contacts_folded[iu, ju].astype(np.float64)
        with np.errstate(divide="ignore"):
            log_p = np.maximum(np.log(samp), -100.0)
            log_1mp = np.maximum(np.log(1.0 - samp), -100.0)
        bce = -(target * log_p + (1.0 - target) * log_1mp)
        return bce.mean(axis=-1)

    def eval_bce(self, xyz_sampled) -> float:
        return float(self.bce_dynamics(xyz_sampled).mean())

    def plot_contact_normcount(self, xyz_sampled, method, save=True,
                               take_log=False, vmin_log=None):
        from twoforone_tpu.evaluate.plots import plot_contact_normcount

        norm_sum = self.normalized_contact_count(xyz_sampled)
        return plot_contact_normcount(
            norm_sum, self.mol_name, method, self.plots_folder,
            save=save, take_log=take_log, vmin_log=vmin_log,
        )


def num_to_groups(num: int, divisor: int):
    """[divisor] * (num // divisor) + optional remainder
    (reference evaluate/evaluators.py:891-901)."""
    groups, remainder = divmod(num, divisor)
    arr = [divisor] * groups
    if remainder > 0:
        arr.append(remainder)
    return arr


def sample_from_model(sample_fn, num_saved_samples: int, batch_size: int,
                      key=None, verbose: bool = False) -> np.ndarray:
    """Batched sampling driver (reference evaluate/evaluators.py:874-888).

    ``sample_fn(batch_size, key) -> (batch, N, 3)``; the driver splits the
    request into batches and concatenates on host. Padding trick: XLA
    compiles one program per distinct batch size, so the remainder batch (if
    any) samples a full batch and truncates.
    """
    import jax

    if key is None:
        key = jax.random.PRNGKey(0)
    print(f"Generating {num_saved_samples} samples. This may take some time.")
    batches = num_to_groups(num_saved_samples, batch_size)
    out = []
    last_print = time.monotonic()
    for i, b in enumerate(batches):
        key, sub = jax.random.split(key)
        full = np.asarray(sample_fn(batch_size, sub))
        out.append(full[:b])
        # Heartbeat: long generations (50k x full reverse chain) must not go
        # silent for an hour — crash-resilient launchers watch log liveness
        # to distinguish a slow phase from a wedged TPU RPC.
        if verbose or time.monotonic() - last_print > 60.0:
            print(f"Batch {i + 1} from {len(batches)} generated", flush=True)
            last_print = time.monotonic()
    all_mol = np.concatenate(out, axis=0)
    print(f"{len(all_mol)} samples generated")
    return all_mol
