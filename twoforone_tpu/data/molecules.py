"""Molecule registry: ids, normalization stds, simulation temperatures.

Mirrors the reference tables (datasets/dataset_utils_empty.py:21-48 and
dynamics/langevin.py:11-43).
"""

from __future__ import annotations

import os
from enum import Enum

ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")
FOLDED_PDB_DIR = os.path.join(ASSETS_DIR, "folded_pdbs")
SAVED_REFERENCES_DIR = os.path.join(ASSETS_DIR, "saved_references")


class Molecules(Enum):
    CHIGNOLIN = "CLN025"
    TRP_CAGE = "2JOF"
    BBA = "1FME"
    VILLIN = "2F4K"
    WW_DOMAIN = "GTT"
    NTL9 = "NTL9"
    BBL = "2WAV"
    PROTEIN_B = "PRB"
    HOMEODOMAIN = "UVF"
    PROTEIN_G = "NuG2"
    ALPHA3D = "A3D"
    LAMBDA_REPRESSOR = "lambda"


all_molecules = ["alanine_dipeptide"] + [mol.name.lower() for mol in Molecules]

# Per-protein dataset standard deviations in Angstrom (the diffusion
# norm_factor); reference datasets/dataset_utils_empty.py:38-48.
norm_stds = {
    Molecules.CHIGNOLIN: 3.113133430480957,
    Molecules.TRP_CAGE: 5.08211088180542,
    Molecules.BBA: 6.294918537139893,
    Molecules.VILLIN: 6.082900047302246,
    Molecules.PROTEIN_G: 6.354289531707764,
    "alanine_fold1": 0.9449278712272644,
    "alanine_fold2": 0.944965124130249,
    "alanine_fold3": 0.9452606439590454,
    "alanine_fold4": 0.9454087018966675,
}

# Simulation/training-data temperatures in Kelvin (dynamics/langevin.py:11-26).
temp_dict = {
    "ALANINE_DIPEPTIDE_FUBERLIN": 300,
    "ALANINE_DIPEPTIDE_MDSHARE": 300,
    "CHIGNOLIN": 340,
    "TRP_CAGE": 290,
    "BBA": 325,
    "VILLIN": 360,
    "WW_DOMAIN": 360,
    "NTL9": 355,
    "BBL": 298,
    "PROTEIN_B": 340,
    "HOMEODOMAIN": 360,
    "PROTEIN_G": 350,
    "ALPHA3D": 370,
    "LAMBDA_REPRESSOR": 350,
}

# Parallel-tempering high temperatures (dynamics/langevin.py:28-43).
temp_dict_pt = {
    "ALANINE_DIPEPTIDE_FUBERLIN": 450,
    "ALANINE_DIPEPTIDE_MDSHARE": 450,
    **{
        m.name: 500
        for m in Molecules
    },
}

# Measured BAOAB step-size derates for extracted-force-field Langevin
# (the ``dt_scale`` knob of dynamics/langevin.LangevinDiffusion). The
# reference pins per-protein noise levels and temperatures
# (evaluate/sampling_commands.md:12-80, dynamics/langevin.py:11-26); this
# table is the analogous production contract for the step size: BAOAB's
# stationary-distribution bias grows with dt and with system size, and at
# the auto-dt default the villin-scale control measurably fails the
# physics bar (TIC-JS 0.1115 > 0.10) while the derated values below are
# measured green (scripts/langevin_t_sweep.py; assets/trained/chain35 and
# chain56 results.json). Sizes without a measured entry fall back to the
# size rule in :func:`default_dt_scale`.
langevin_dt_scale_dict = {
    "ALANINE_DIPEPTIDE_FUBERLIN": 1.0,
    "ALANINE_DIPEPTIDE_MDSHARE": 1.0,
    "CHIGNOLIN": 1.0,   # N=10, measured green at 1.0 (assets/trained/chain10)
    "TRP_CAGE": 1.0,    # N=20, measured green at 1.0 (assets/trained/chain20)
    "BBA": 0.35,        # N=28, measured green (chain28: occupancy err 0.051;
                        # 0.5 failed the bar at 0.1031 over a 150k window)
    "VILLIN": 0.5,      # N=35, measured green (chain35; 1.0 fails at 0.1115)
    "PROTEIN_G": 0.35,  # N=56, measured green (chain56)
}


def default_dt_scale(mol_name: str, num_beads: int = None) -> float:
    """Production default for the Langevin ``dt_scale`` knob.

    Measured per-protein values where a trained control validated them
    (``langevin_dt_scale_dict``); otherwise a conservative size rule
    interpolating the measured regimes (<25 beads: 1.0; 25-49: 0.5;
    >=50: 0.35). Used by cli/sample.py when ``--dt_scale`` is not given
    and by the control launchers.
    """
    knob = langevin_dt_scale_dict.get(mol_name.upper())
    if knob is not None:
        return knob
    if num_beads is None or num_beads < 25:
        return 1.0
    return 0.5 if num_beads < 50 else 0.35


# Physics constants (dynamics/langevin.py:6-9): Boltzmann constant in
# g/mol * Angstrom^2 / ps^2 / K, plus SI anchors for the kcal variant.
KBOLTZMANN = 1.38064852e-23
AVOGADRO = 6.022140857e23
JPERKCAL = 4184
KB = 0.83144626181

# Bead masses in g/mol (reference trainer.py:352, sample.py:216-221).
MASS_ALA2 = 12.8
MASS_FASTFOLDER = 12.0


def folded_pdb_path(mol_name: str, ca_only: bool = True) -> str:
    """Path to the packaged folded structure for a fast-folding protein."""
    if "alanine" in mol_name.lower():
        return os.path.join(FOLDED_PDB_DIR, "ala2_cg.pdb")
    protid = Molecules[mol_name.upper()].value
    fname = f"{protid}-0-c-alpha.pdb" if ca_only else f"{protid}.pdb"
    return os.path.join(FOLDED_PDB_DIR, fname)
