"""Slab-sharded device LPT ICs vs the single-device device path at 32^3.

Both paths share the host RNG draw (bit-identical white noise); the
sharded path runs the LPT algebra through the pencil FFTs
(parallel/slab.py, one all_to_all per 3D FFT) instead of jnp.fft.rfftn,
so agreement is at float32 FFT roundoff on the displacement scale. The
gathered shard order IS the lattice order (shards own contiguous
x-planes), so rows compare one for one.
"""

import numpy as np
import pytest

from pysco_tpu import cosmo, ic_device, solver as solver_mod
from pysco_tpu.parallel import ic_slab, slab
from pysco_tpu.ops import pallas_pm

NDEV = 8


def _param(tmp_path, order, dealias=False):
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
        "write_initial_snapshot": False, "parallel_mode": "slab",
    }


def _wrap_dist(a, b):
    d = np.abs(a - b)
    return np.minimum(d, 1.0 - d)


@pytest.mark.parametrize("order,dealias", [
    ("1LPT", False), ("2LPT", False), ("2LPT", True), ("3LPT", False),
    ("3LPT", True),
])
def test_slab_ic_matches_single_device(tmp_path, order, dealias):
    param = dict(_param(tmp_path, order, dealias))
    param["aexp"] = 1.0 / (1 + param["z_start"])
    tables = cosmo.generate(param)

    mesh = slab.make_mesh(NDEV)
    assert ic_slab.supported(param, NDEV)
    pos_s, vel_s, acc, phi, u, ts = ic_slab.generate_lpt_slab(
        param, tables, mesh
    )
    cfg = solver_mod.config_from_param(param)
    # gathered shard order == lattice order (x-plane-contiguous shards)
    pos_rows, vel_rows = slab.gather_particles(cfg, NDEV, pos_s, vel_s)
    assert pos_rows.shape == (param["npart"], 3)

    param_d = dict(param, parallel_mode="single")
    assert ic_device.supported(param_d)
    pos_cols, vel_cols = ic_device.generate_lpt(param_d, tables)
    pos_1, vel_1 = solver_mod.particles_to_rows(cfg, pos_cols, vel_cols)

    assert np.all(_wrap_dist(pos_rows, pos_1) < 5e-6)
    scale = max(np.abs(vel_1).max(), 1e-12)
    np.testing.assert_allclose(vel_rows, vel_1, atol=5e-6 * scale + 5e-8,
                               rtol=0)

    # the rest of the state tuple matches the distribute_particles layout
    cap = slab.shard_capacity(param["npart"], NDEV,
                              float(param.get("slab_slack", 1.25)))
    assert pos_s.shape == (4, NDEV * cap)
    assert acc.shape == pos_s.shape
    m = cfg.ncells_1d
    assert phi.shape == (m, m, m)
    assert ts.shape == (NDEV * ((m // NDEV) * (m // pallas_pm.YB) + 1),)


def test_slab_ic_fixed_paired_matches_single_device(tmp_path):
    """Fixed-amplitude paired variant through the sharded noise assembly
    (_make_noise_to_density_k fixed=True branch)."""
    param = dict(_param(tmp_path, "1LPT", False))
    param["fixed_ICS"] = True
    param["paired_ICS"] = True
    param["aexp"] = 1.0 / (1 + param["z_start"])
    tables = cosmo.generate(param)

    mesh = slab.make_mesh(NDEV)
    assert ic_slab.supported(param, NDEV)
    pos_s, vel_s, *_ = ic_slab.generate_lpt_slab(param, tables, mesh)
    cfg = solver_mod.config_from_param(param)
    pos_rows, vel_rows = slab.gather_particles(cfg, NDEV, pos_s, vel_s)

    param_d = dict(param, parallel_mode="single")
    pos_cols, vel_cols = ic_device.generate_lpt(param_d, tables)
    pos_1, vel_1 = solver_mod.particles_to_rows(cfg, pos_cols, vel_cols)

    assert np.all(_wrap_dist(pos_rows, pos_1) < 5e-6)
    scale = max(np.abs(vel_1).max(), 1e-12)
    np.testing.assert_allclose(vel_rows, vel_1, atol=5e-6 * scale + 5e-8,
                               rtol=0)


def test_slab_ic_run_end_to_end(tmp_path):
    """pysco_tpu.run with parallel_mode=slab takes the sharded device IC
    path (no host distribution) and steps fine."""
    import pysco_tpu

    param = dict(_param(tmp_path, "2LPT"))
    param["z_out"] = "[48]"
    param["save_power_spectrum"] = "no"
    param["integrator"] = "leapfrog"
    param["n_reorder"] = 50
    param["Courant_factor"] = 1.0
    param["max_aexp_stepping"] = 10
    param["write_initial_snapshot"] = True  # parity: output_00000 written
    pysco_tpu.run(param)
    base = tmp_path / "run"
    assert list((base / "output_00000").glob("particles_*"))
    snaps = sorted(base.glob("output_00001/particles_*"))
    assert snaps, "final snapshot missing"
