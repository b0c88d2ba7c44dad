"""Device-side LPT IC generation vs the host NumPy path at 32^3.

The two paths share the host RNG draw (bit-identical white noise); the
spectral/LPT algebra runs through np.fft (float64 internally) on the host
and XLA float32 FFTs on the device, so agreement is at float32 FFT
roundoff on the displacement scale."""

import numpy as np
import pytest

from pysco_tpu import cosmo, ic, ic_device, solver as solver_mod


def _param(tmp_path, order, dealias):
    pk_file = tmp_path / "pk.dat"
    cosmo.write_power_spectrum_table(str(pk_file))
    base = tmp_path / "run"
    for sub in ("", "output_00000"):
        (base / sub).mkdir(parents=True, exist_ok=True)
    return {
        "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
        "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
        "ncoarse": 5, "npart": 32 ** 3, "z_start": 49, "seed": 42,
        "position_ICS": "center", "fixed_ICS": False, "paired_ICS": False,
        "dealiased_ICS": dealias, "power_spectrum_file": str(pk_file),
        "initial_conditions": order, "base": str(base), "extra": "test",
        "output_snapshot_format": "HDF5", "mass_scheme": "TSC",
        "linear_newton_solver": "fft", "gradient_stencil_order": 5,
        "Npre": 2, "Npost": 1, "fR_n": 1, "mond_function": "simple",
        "mond_alpha": 1.0, "epsrel": 1e-2, "particle_engine": "pallas",
        "parametrized_mu0": 0.0, "Om_r": 0.0, "Om_lambda": 0.74267,
        "unit_l": 1.0, "unit_t": 1.0, "verbose": 0,
    }


def _wrap_dist(a, b):
    d = np.abs(a - b)
    return np.minimum(d, 1.0 - d)


@pytest.mark.parametrize("order,dealias", [
    ("1LPT", False), ("2LPT", False), ("2LPT", True), ("3LPT", False),
])
def test_device_ic_matches_host(tmp_path, order, dealias):
    param = dict(_param(tmp_path, order, dealias))
    param["aexp"] = 1.0 / (1 + param["z_start"])
    tables = cosmo.generate(param)

    param_h = dict(param)
    param_h["base"] = str(tmp_path / "host")
    (tmp_path / "host" / "output_00000").mkdir(parents=True)
    pos_h, vel_h = ic.generate(param_h, tables)

    assert ic_device.supported(param)
    pos_cols, vel_cols = ic_device.generate_lpt(param, tables)
    cfg = solver_mod.config_from_param(param)
    pos_d, vel_d = solver_mod.particles_to_rows(cfg, pos_cols, vel_cols)

    # same lattice order on both paths: compare row for row
    assert pos_d.shape == pos_h.shape
    assert np.all(_wrap_dist(pos_d, np.asarray(pos_h)) < 5e-6)
    np.testing.assert_allclose(vel_d, vel_h, atol=5e-6, rtol=1e-4)

    # snapshot written by the device path too
    assert list((tmp_path / "run" / "output_00000").glob("particles_*"))


@pytest.mark.parametrize("paired", [False, True])
def test_device_ic_matches_host_fixed(tmp_path, paired):
    """Fixed-amplitude (and paired) variant: exercises the device-side
    _noise_fixed_to_density_k assembly against the host path."""
    param = dict(_param(tmp_path, "1LPT", False))
    param["fixed_ICS"] = True
    param["paired_ICS"] = paired
    param["aexp"] = 1.0 / (1 + param["z_start"])
    tables = cosmo.generate(param)

    param_h = dict(param)
    param_h["base"] = str(tmp_path / "host")
    (tmp_path / "host" / "output_00000").mkdir(parents=True)
    pos_h, vel_h = ic.generate(param_h, tables)

    assert ic_device.supported(param)
    pos_cols, vel_cols = ic_device.generate_lpt(param, tables)
    cfg = solver_mod.config_from_param(param)
    pos_d, vel_d = solver_mod.particles_to_rows(cfg, pos_cols, vel_cols)

    assert pos_d.shape == pos_h.shape
    assert np.all(_wrap_dist(pos_d, np.asarray(pos_h)) < 5e-6)
    np.testing.assert_allclose(vel_d, vel_h, atol=5e-6, rtol=1e-4)
