"""End-to-end simulation tests: every gravity theory and solver runs a few
steps at tiny grid size and produces sane, PySCo-format outputs."""

import glob
import os

import numpy as np
import pytest

import pysco_tpu


def _write_power_spectrum(path):
    """Synthetic linear P(k): a smooth power law with a turnover."""
    k = np.logspace(-3, 2, 200)
    k0 = 0.02
    pk = 2e4 * (k / k0) / (1 + (k / k0) ** 2) ** 2 * 1e2
    np.savetxt(path, np.c_[k, pk])
    return path


def _base_param(tmp_path, **kw):
    param = {
        "nthreads": 1,
        "theory": "newton",
        "fR_logfR0": 5,
        "fR_n": 1,
        "mond_function": "simple",
        "mond_g0": 1.2,
        "mond_scale_factor_exponent": 0,
        "mond_alpha": 1,
        "parametrized_mu0": -0.1,
        "H0": 72,
        "Om_m": 0.25733,
        "T_cmb": 2.726,
        "N_eff": 3.044,
        "w0": -1.0,
        "wa": 0.0,
        "boxlen": 100,
        "ncoarse": 4,
        "npart": 16 ** 3,
        "z_start": 49,
        "seed": 42,
        "position_ICS": "center",
        "fixed_ICS": False,
        "paired_ICS": False,
        "dealiased_ICS": False,
        "power_spectrum_file": _write_power_spectrum(tmp_path / "pk.dat"),
        "initial_conditions": "2LPT",
        "base": str(tmp_path / "run"),
        "output_snapshot_format": "HDF5",
        "z_out": "[40]",
        "save_power_spectrum": "z_out",
        "integrator": "leapfrog",
        "mass_scheme": "TSC",
        "n_reorder": 3,
        "Courant_factor": 1.0,
        "max_aexp_stepping": 10,
        "linear_newton_solver": "multigrid",
        "gradient_stencil_order": 5,
        "Npre": 2,
        "Npost": 1,
        "epsrel": 1e-2,
        "verbose": 0,
    }
    param.update(kw)
    return param


def _check_outputs(param):
    base = param["base"]
    snaps = glob.glob(f"{base}/output_00001/particles_*.h5") + glob.glob(
        f"{base}/output_00001/particles_*.parquet"
    )
    assert snaps, f"no snapshot written under {base}/output_00001"
    pks = glob.glob(f"{base}/power/pk_*.dat")
    assert pks, "no power spectrum written"
    data = np.loadtxt(pks[-1])
    assert data.shape[1] == 3
    assert np.isfinite(data).all()
    assert (data[:, 1] >= 0).all()
    import h5py

    if snaps[0].endswith(".h5"):
        with h5py.File(snaps[0], "r") as f:
            pos = f["position"][:]
            vel = f["velocity"][:]
            assert pos.shape == (param["npart"], 3)
            assert (pos >= 0).all() and (pos < 1).all()
            assert np.isfinite(vel).all()
            assert abs(float(f.attrs["aexp"]) - 1.0 / 41.0) < 1e-3


@pytest.mark.parametrize(
    "name,overrides",
    [
        ("newton_fft_cic", {"linear_newton_solver": "fft", "mass_scheme": "CIC",
                            "initial_conditions": "1LPT"}),
        ("newton_fft7pt", {"linear_newton_solver": "fft_7pt"}),
        ("newton_fullfft", {"linear_newton_solver": "full_fft",
                            "save_power_spectrum": "yes"}),
        ("newton_multigrid_tsc_2lpt", {}),
        ("newton_euler", {"integrator": "euler",
                          "linear_newton_solver": "fft"}),
        ("parametrized", {"theory": "parametrized",
                          "linear_newton_solver": "fft"}),
        ("fr_n1", {"theory": "fr", "fR_n": 1, "fR_logfR0": 5}),
        ("fr_n2", {"theory": "fr", "fR_n": 2, "fR_logfR0": 5}),
        ("mond_multigrid", {"theory": "mond"}),
        ("mond_fft7pt", {"theory": "mond", "linear_newton_solver": "fft_7pt"}),
        ("lpt3_dealiased", {"initial_conditions": "3LPT",
                            "dealiased_ICS": True,
                            "linear_newton_solver": "fft"}),
        ("fixed_paired", {"fixed_ICS": True, "paired_ICS": True,
                          "linear_newton_solver": "fft"}),
        ("parquet_output", {"output_snapshot_format": "parquet",
                            "linear_newton_solver": "fft"}),
        ("pallas_engine", {"particle_engine": "pallas",
                           "linear_newton_solver": "fft"}),
        ("scatter_engine", {"particle_engine": "scatter",
                            "linear_newton_solver": "fft"}),
    ],
)
def test_full_run(tmp_path, name, overrides):
    param = _base_param(tmp_path, **overrides)
    pysco_tpu.run(param)
    _check_outputs(param)


def test_restart_roundtrip(tmp_path):
    param = _base_param(tmp_path, linear_newton_solver="fft")
    pysco_tpu.run(param)
    # restart from snapshot 1, run to a slightly later redshift
    param2 = _base_param(
        tmp_path, linear_newton_solver="fft",
        initial_conditions=1, z_out="[38]",
    )
    param2["extra"] = None  # recomputed inside run
    pysco_tpu.run(param2)
    snaps = glob.glob(f"{param2['base']}/output_00002/particles_*.h5")
    assert snaps


def test_run_paired(tmp_path):
    """Paired-and-fixed driver: both phases run, P(k) averaged."""
    import glob

    import pysco_tpu
    from pysco_tpu.cosmo import write_power_spectrum_table

    pk_file = tmp_path / "pk.dat"
    write_power_spectrum_table(str(pk_file))
    base = tmp_path / "paired"
    param = {
        "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
        "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
        "ncoarse": 4, "npart": 16 ** 3, "z_start": 49, "seed": 7,
        "position_ICS": "center", "dealiased_ICS": False,
        "power_spectrum_file": str(pk_file),
        "initial_conditions": "1LPT", "base": str(base),
        "output_snapshot_format": "HDF5", "z_out": "[44]",
        "save_power_spectrum": "z_out", "integrator": "leapfrog",
        "mass_scheme": "TSC", "n_reorder": 50, "Courant_factor": 1.0,
        "max_aexp_stepping": 10, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "epsrel": 1e-2, "verbose": 0,
    }
    pysco_tpu.run_paired(param)
    import numpy as np

    avg = sorted(glob.glob(str(base / "power" / "pk_*.dat")))
    assert avg, "averaged P(k) written"
    a = np.loadtxt(sorted(glob.glob(str(base / "pair_A/power/pk_*.dat")))[-1])
    b = np.loadtxt(sorted(glob.glob(str(base / "pair_B/power/pk_*.dat")))[-1])
    m = np.loadtxt(avg[-1])
    np.testing.assert_allclose(m[:, 1], 0.5 * (a[:, 1] + b[:, 1]), rtol=1e-5)
    # the pair really differs (opposite phases), but shares amplitudes
    assert not np.allclose(a[:, 1], b[:, 1])
