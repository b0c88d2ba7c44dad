"""Sharding tests: the 8-device SPMD step must reproduce the single-device
step (up to float32 summation-order differences in the psum'd deposit)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pysco_tpu import integrate, solver as solver_mod
from pysco_tpu.parallel import pm as par_pm


def _setup(engine):
    n = 16
    npart = n ** 3
    rng = np.random.default_rng(0)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.01 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": "newton", "ncoarse": 4, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": engine,
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    pos, vel, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    return cfg, dyn, pos, vel, acc, phi, u


def _canonical(pos, vel):
    """Sort particle rows lexicographically for order-independent compare."""
    pos, vel = np.array(pos), np.array(vel)
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    return pos[order], vel[order]


def _shard_rows(cfg, pos, vel):
    """Sharded output -> (n, 3) real rows (drops pallas sentinel columns,
    which sit per-shard rather than in one global tail)."""
    pos, vel = np.array(pos), np.array(vel)
    if pos.ndim == 2 and pos.shape[0] == 4:
        real = pos[0] < 1.5
        return pos[:3, real].T, vel[:3, real].T
    return pos, vel


def test_multidevice_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("engine", ["scatter", "dense", "pallas"])
def test_sharded_step_matches_single_device(engine):
    cfg, dyn, pos, vel, acc, phi, u = _setup(engine)
    dt = np.float32(5e-3)

    ref = integrate.step(
        cfg, "leapfrog", False, False, pos, vel, acc, phi, u, dyn, dt
    )

    mesh = par_pm.make_mesh(8)
    sharded = par_pm.shard_state(mesh, pos, vel, acc, phi, u)
    step_fn = par_pm.make_sharded_step(cfg, mesh, "leapfrog", False)
    got = step_fn(*sharded, dyn, dt)

    # particle order may differ (global vs per-shard plane sort):
    # compare canonically ordered rows
    rp, rv = _canonical(*solver_mod.particles_to_rows(cfg, ref[0], ref[1]))
    gp, gv = _canonical(*_shard_rows(cfg, got[0], got[1]))
    np.testing.assert_allclose(rp, gp, atol=1e-6)
    np.testing.assert_allclose(rv, gv, atol=1e-5, rtol=1e-4)
    # replicated fields identical up to psum rounding
    np.testing.assert_allclose(
        np.array(ref[3]), np.array(got[3]), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(ref[6].max_abs_acc), float(got[6].max_abs_acc), rtol=1e-4
    )
    assert int(got[6].overflow) == 0


@pytest.mark.parametrize("theory,extra", [
    ("fr", {"fR_logfR0": 5.0, "fR_n": 1, "Om_lambda": 0.7, "Om_r": 0.0,
            "w0": -1.0, "wa": 0.0, "unit_l": 1.0, "unit_t": 1.0,
            "linear_newton_solver": "multigrid"}),
    ("mond", {"mond_g0": 1.2, "mond_scale_factor_exponent": 0.0,
              "mond_function": "simple", "unit_l": 3085.0, "unit_t": 1e10,
              "linear_newton_solver": "multigrid"}),
])
def test_sharded_step_modified_gravity(theory, extra):
    """f(R)/QUMOND sharded step == single-device step (replicated grids)."""
    n = 16
    npart = n ** 3
    rng = np.random.default_rng(7)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.01 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": theory, "ncoarse": 4, "npart": npart,
        "mass_scheme": "tsc", "gradient_stencil_order": 5,
        "Npre": 2, "Npost": 1, "fR_n": 1, "mond_function": "simple",
        "mond_alpha": 1.0, "aexp": 0.2, "Om_m": 0.3, "epsrel": 1e-3,
        "particle_engine": "dense", "linear_newton_solver": "multigrid",
    }
    param.update(extra)
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    pos_j, vel_j, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    dt = np.float32(5e-3)
    ref = integrate.step(
        cfg, "leapfrog", False, False, pos_j, vel_j, acc, phi, u, dyn, dt
    )
    mesh = par_pm.make_mesh(8)
    sharded = par_pm.shard_state(mesh, pos_j, vel_j, acc, phi, u)
    step_fn = par_pm.make_sharded_step(cfg, mesh, "leapfrog", False)
    got = step_fn(*sharded, dyn, dt)
    rp, rv = _canonical(ref[0], ref[1])
    gp, gv = _canonical(got[0], got[1])
    np.testing.assert_allclose(rp, gp, atol=1e-6)
    np.testing.assert_allclose(rv, gv, atol=1e-5, rtol=1e-4)
    # potential and (for fr) scalaron fields agree up to psum rounding
    np.testing.assert_allclose(
        np.array(ref[3]), np.array(got[3]), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.array(ref[4]), np.array(got[4]), atol=2e-4, rtol=1e-3
    )


def test_sharded_multistep_pk_fidelity():
    """P(k) of the particle field after several sharded steps matches the
    single-device run to well under the 0.1% target."""
    from pysco_tpu.ops import fourier, mesh as mesh_ops

    n = 16
    npart = n ** 3
    rng = np.random.default_rng(8)
    grid = (np.indices((n, n, n)).reshape(3, -1).T + 0.5) / n
    pos = (grid + 0.002 * rng.standard_normal((npart, 3))).astype(
        np.float32
    ) % 1
    vel = (0.05 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": "newton", "ncoarse": 4, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": "dense",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    pos_j, vel_j, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    dt = np.float32(2e-3)
    nsteps = 6

    state = (pos_j, vel_j, acc, phi, u)
    for _ in range(nsteps):
        out = integrate.step(cfg, "leapfrog", False, False, *state, dyn, dt)
        state = out[:5]
    pos_ref = state[0]

    mesh = par_pm.make_mesh(8)
    sharded = par_pm.shard_state(mesh, pos_j, vel_j, acc, phi, u)
    step_fn = par_pm.make_sharded_step(cfg, mesh, "leapfrog", False)
    got = sharded + (None,)
    cur = sharded
    for _ in range(nsteps):
        out = step_fn(*cur, dyn, dt)
        cur = out[:5]
    pos_shard = cur[0]

    def pk_of(p):
        dens = mesh_ops.deposit(jnp.asarray(np.array(p)), n, "tsc")
        k, pk, nm = fourier.power_spectrum(fourier.rfft3(dens), 3)
        return np.array(pk)

    pk_ref, pk_shard = pk_of(pos_ref), pk_of(pos_shard)
    rel = np.abs(pk_shard - pk_ref) / pk_ref
    assert rel.max() < 1e-3, f"max sharded P(k) deviation {rel.max():.2e}"


def test_sharded_step_multigrid():
    cfg, dyn, pos, vel, acc, phi, u = _setup("dense")
    cfg_mg = dataclasses.replace(cfg, linear_newton_solver="multigrid")
    pos, vel, acc0, phi0, u0, _, _ = solver_mod.pm(
        cfg_mg, True, False, pos, vel, *solver_mod.empty_fields(cfg_mg), dyn
    )
    dt = np.float32(5e-3)
    ref = integrate.step(
        cfg_mg, "leapfrog", False, False, pos, vel, acc0, phi0, u0, dyn, dt
    )
    mesh = par_pm.make_mesh(8)
    sharded = par_pm.shard_state(mesh, pos, vel, acc0, phi0, u0)
    step_fn = par_pm.make_sharded_step(cfg_mg, mesh, "leapfrog", False)
    got = step_fn(*sharded, dyn, dt)
    rp, rv = _canonical(ref[0], ref[1])
    gp, gv = _canonical(got[0], got[1])
    np.testing.assert_allclose(rp, gp, atol=1e-6)
    np.testing.assert_allclose(
        np.array(ref[3]), np.array(got[3]), atol=1e-4, rtol=1e-3
    )


def test_run_replicated_end_to_end(tmp_path):
    """pysco_tpu.run with parallel_mode='replicated' (particles sharded,
    grids replicated): full simulation on the 8-device mesh, snapshots
    and P(k) written, final state matching a parallel_mode='single' run
    (same engine, same maths; only the deposit's psum summation order
    differs)."""
    import pysco_tpu
    from pysco_tpu.cosmo import write_power_spectrum_table
    from pysco_tpu.utils import io as iostream

    pk_file = tmp_path / "pk.dat"
    write_power_spectrum_table(str(pk_file))

    def run(base, mode):
        param = {
            "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
            "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
            "ncoarse": 5, "npart": 16 ** 3, "z_start": 49, "seed": 42,
            "position_ICS": "center", "fixed_ICS": False,
            "paired_ICS": False, "dealiased_ICS": False,
            "power_spectrum_file": str(pk_file),
            "initial_conditions": "2LPT", "base": str(base),
            "output_snapshot_format": "HDF5", "z_out": "[44]",
            "save_power_spectrum": "z_out", "integrator": "leapfrog",
            "mass_scheme": "TSC", "n_reorder": 50, "Courant_factor": 1.0,
            "max_aexp_stepping": 10, "linear_newton_solver": "fft",
            "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
            "epsrel": 1e-2, "verbose": 1, "parallel_mode": mode,
        }
        pysco_tpu.run(param)
        snap = sorted(base.glob("output_*/particles_*"))[-1]
        pks = sorted(base.glob("power/pk_*.dat"))
        assert pks, "P(k) written at z_out"
        return iostream.read_snapshot_particles_hdf5(str(snap))

    pos_r, vel_r = run(tmp_path / "rep", "replicated")
    assert pos_r.shape == (16 ** 3, 3)
    assert np.isfinite(pos_r).all() and np.isfinite(vel_r).all()
    assert ((pos_r >= 0) & (pos_r < 1)).all()

    pos_s, vel_s = run(tmp_path / "single", "single")
    oi = np.lexsort((pos_r[:, 2], pos_r[:, 1], pos_r[:, 0]))
    oj = np.lexsort((pos_s[:, 2], pos_s[:, 1], pos_s[:, 0]))
    np.testing.assert_allclose(pos_r[oi], pos_s[oj], atol=2e-6)
    np.testing.assert_allclose(
        vel_r[oi], vel_s[oj],
        atol=2e-4 * max(np.abs(vel_s).max(), 1e-8), rtol=2e-3,
    )
