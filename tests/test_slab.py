"""Slab-decomposed SPMD tests on the 8-device virtual CPU mesh: the fully
sharded step (grids AND particles sharded) must reproduce the
single-device pallas-engine step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pysco_tpu import integrate, solver as solver_mod
from pysco_tpu.ops import fourier, mesh as mesh_ops, pallas_pm
from pysco_tpu.parallel import slab

M = 32
NDEV = 8


def _mesh():
    return slab.make_mesh(NDEV)


def test_pencil_fft_roundtrip_and_match():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((M, M, M)).astype(np.float32)
    mesh = _mesh()

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
                         check_vma=False)
    def pencil_solve(x_local):
        xk = slab.rfft3_slab(x_local, NDEV)
        xk = slab.inverse_laplacian_slab(xk, M, 2)
        return slab.irfft3_slab(xk, M)

    got = np.array(pencil_solve(jnp.asarray(x)))
    want = np.array(
        fourier.irfft3(
            fourier.inverse_laplacian_compensated(fourier.rfft3(jnp.asarray(x)), 2)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


@pytest.mark.parametrize("order", [2, 3, 5, 7])
def test_derivative_slab_matches_single(order):
    rng = np.random.default_rng(1)
    phi = rng.standard_normal((M, M, M)).astype(np.float32)
    mesh = _mesh()

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
                         check_vma=False)
    def grad(phi_local):
        return slab.derivative_slab(phi_local, order, NDEV)

    got = np.array(grad(jnp.asarray(phi)))
    want = np.array(mesh_ops.derivative(jnp.asarray(phi), order))
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())


def test_power_spectrum_slab_matches_single():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((M, M, M)).astype(np.float32)
    mesh = _mesh()

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P("dp"),
                         out_specs=(P(), P(), P()), check_vma=False)
    def pk_slab(x_local):
        return slab.power_spectrum_slab(slab.rfft3_slab(x_local, NDEV), M, 3)

    k1, p1, n1 = (np.array(v) for v in pk_slab(jnp.asarray(x)))
    k0, p0, n0 = (np.array(v) for v in
                  fourier.power_spectrum(fourier.rfft3(jnp.asarray(x)), 3))
    np.testing.assert_allclose(n1, n0)
    np.testing.assert_allclose(k1, k0, rtol=1e-5)
    np.testing.assert_allclose(p1, p0, rtol=1e-4)


def _single_device_reference(pos, vel, param, nsteps, dt):
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    p, v, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    state = (p, v, acc, phi, u)
    for _ in range(nsteps):
        out = integrate.step(cfg, "leapfrog", False, False, *state, dyn, dt)
        state = out[:5]
    return solver_mod.particles_to_rows(cfg, state[0], state[1])


@pytest.mark.parametrize("scheme", ["cic", "tsc"])
def test_slab_step_matches_single_device(scheme):
    npart = M ** 3 // 4
    rng = np.random.default_rng(2)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.05 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": "newton", "ncoarse": 5, "npart": npart,
        "mass_scheme": scheme, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    dt = np.float32(2e-3)
    nsteps = 3  # enough steps that particles migrate between slabs

    mesh = _mesh()
    state = slab.distribute_particles(mesh, cfg, pos, vel)
    step_fn = slab.make_slab_step(cfg, mesh, "leapfrog")
    # first slab step doubles as the initial force evaluation: start from
    # acc = 0 and a zero-velocity half-kick equivalent by running the
    # reference from the same construction
    pos_d, vel_d, acc_d, phi_d = state
    for _ in range(nsteps + 1):
        pos_d, vel_d, acc_d, phi_d, _, diag = step_fn(
            pos_d, vel_d, acc_d, phi_d, dyn, dt
        )
        assert int(diag.overflow) == 0
    got_p, got_v = slab.gather_particles(cfg, NDEV, pos_d, vel_d)

    # single-device reference: same sequence (pm first call with acc from
    # step 0 differs -- instead replicate by running the plain step loop
    # from acc=0 using the unsharded engine)
    phi0, u0 = solver_mod.empty_fields(cfg)
    p, v = pallas_pm.to_columns(jnp.asarray(pos), jnp.asarray(vel), npart)
    acc = jnp.zeros_like(p)
    state1 = (p, v, acc, phi0, u0)
    for _ in range(nsteps + 1):
        out = integrate.step(cfg, "leapfrog", False, False, *state1, dyn, dt)
        state1 = out[:5]
    want_p, want_v = solver_mod.particles_to_rows(cfg, state1[0], state1[1])

    assert got_p.shape == want_p.shape
    # order-independent comparison
    oi = np.lexsort((got_p[:, 2], got_p[:, 1], got_p[:, 0]))
    oj = np.lexsort((want_p[:, 2], want_p[:, 1], want_p[:, 0]))
    np.testing.assert_allclose(got_p[oi], want_p[oj], atol=2e-6)
    np.testing.assert_allclose(got_v[oi], want_v[oj], atol=1e-4, rtol=1e-3)


def test_migration_conserves_mass():
    """Particles placed on slab boundaries with velocities crossing them
    must keep total deposited mass exact across steps."""
    npart = 4096
    rng = np.random.default_rng(3)
    pos = rng.random((npart, 3), dtype=np.float32)
    # park half the particles right at slab boundaries
    planes = M // NDEV
    pos[: npart // 2, 0] = (
        (rng.integers(0, NDEV, npart // 2) * planes).astype(np.float32) / M
        + 1e-4
    )
    vel = (0.2 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": "newton", "ncoarse": 5, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    mesh = _mesh()
    pos_d, vel_d, acc_d, phi_d = slab.distribute_particles(mesh, cfg, pos, vel)
    step_fn = slab.make_slab_step(cfg, mesh, "leapfrog")
    for _ in range(4):
        pos_d, vel_d, acc_d, phi_d, _, diag = step_fn(
            pos_d, vel_d, acc_d, phi_d, dyn, np.float32(2e-3)
        )
        assert int(diag.overflow) == 0
    got_p = slab.gather_particles(cfg, NDEV, pos_d)
    assert got_p.shape[0] == npart  # every particle accounted for
