#!/usr/bin/env python
"""Minimal package-mode driver: run a small simulation from a dict."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pysco_tpu
from pysco_tpu.cosmo import write_power_spectrum_table

here = os.path.dirname(os.path.abspath(__file__))
pk_file = os.path.join(here, "pk_eh98_z0.dat")
if not os.path.exists(pk_file):
    write_power_spectrum_table(pk_file)

param = {
    "theory": "newton",
    "H0": 72,
    "Om_m": 0.25733,
    "T_cmb": 2.726,
    "N_eff": 3.044,
    "w0": -1.0,
    "wa": 0.0,
    "boxlen": 100,
    "ncoarse": 6,
    "npart": 64 ** 3,
    "z_start": 49,
    "seed": 42,
    "position_ICS": "center",
    "fixed_ICS": False,
    "paired_ICS": False,
    "dealiased_ICS": False,
    "power_spectrum_file": pk_file,
    "initial_conditions": "2LPT",
    "base": os.path.join(here, "run_example"),
    "output_snapshot_format": "HDF5",
    "z_out": "[2, 0]",
    "save_power_spectrum": "z_out",
    "integrator": "leapfrog",
    "mass_scheme": "TSC",
    "n_reorder": 50,
    "Courant_factor": 1.0,
    "max_aexp_stepping": 10,
    "linear_newton_solver": "multigrid",
    "gradient_stencil_order": 5,
    "Npre": 2,
    "Npost": 1,
    "epsrel": 1e-2,
    "verbose": 1,
}

if __name__ == "__main__":
    pysco_tpu.run(param)
