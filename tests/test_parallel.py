"""Sharding tests: the 8-device SPMD step must reproduce the single-device
step bit-for-bit (deterministic scatter order aside, to float32 tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pysco_tpu import integrate, solver as solver_mod
from pysco_tpu.parallel import pm as par_pm


@pytest.fixture(scope="module")
def setup():
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
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    acc, phi, u, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), phi0, u0, dyn
    )
    return cfg, dyn, jnp.asarray(pos), jnp.asarray(vel), acc, phi, u


def test_multidevice_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device(setup):
    cfg, dyn, pos, vel, acc, phi, u = setup
    dt = np.float32(5e-3)

    ref = integrate.step(
        cfg, "leapfrog", False, False, pos, vel, acc, phi, u, dyn, dt
    )

    mesh = par_pm.make_mesh(8)
    sharded = par_pm.shard_state(mesh, pos, vel, acc, phi, u)
    step_fn = par_pm.make_sharded_step(cfg, mesh, "leapfrog", False)
    got = step_fn(*sharded, dyn, dt)

    labels = ("position", "velocity", "acceleration", "potential", "u")
    for name, a, b in zip(labels, ref[:5], got[:5]):
        np.testing.assert_allclose(
            np.array(a), np.array(b), atol=2e-6, rtol=1e-5, err_msg=name
        )
    # diagnostics agree
    np.testing.assert_allclose(
        float(ref[6].max_abs_acc), float(got[5].max_abs_acc), rtol=1e-5
    )


def test_sharded_step_multigrid(setup):
    cfg, dyn, pos, vel, acc, phi, u = setup
    import dataclasses

    cfg_mg = dataclasses.replace(cfg, linear_newton_solver="multigrid")
    acc0, phi0, u0, _ = solver_mod.pm(
        cfg_mg, True, False, pos, *solver_mod.empty_fields(cfg_mg), dyn
    )
    dt = np.float32(5e-3)
    ref = integrate.step(
        cfg_mg, "leapfrog", False, False, pos, vel, acc0, phi0, u0, dyn, dt
    )
    mesh = par_pm.make_mesh(8)
    sharded = par_pm.shard_state(mesh, pos, vel, acc0, phi0, u0)
    step_fn = par_pm.make_sharded_step(cfg_mg, mesh, "leapfrog", False)
    got = step_fn(*sharded, dyn, dt)
    np.testing.assert_allclose(
        np.array(ref[0]), np.array(got[0]), atol=2e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.array(ref[3]), np.array(got[3]), atol=1e-5, rtol=1e-4
    )
