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
    pos_d, vel_d, acc_d, phi_d, u_d, ts_d = state
    for _ in range(nsteps + 1):
        pos_d, vel_d, acc_d, phi_d, u_d, ts_d, _, diag = step_fn(
            pos_d, vel_d, acc_d, phi_d, u_d, ts_d, dyn, dt
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


@pytest.mark.parametrize("theory,solver_name,extra", [
    ("newton", "multigrid", {}),
    ("newton", "full_fft", {}),
    ("fr", "multigrid", {"fR_logfR0": 5.0, "fR_n": 1, "Om_lambda": 0.7,
                         "Om_r": 0.0, "w0": -1.0, "wa": 0.0,
                         "unit_l": 1.0, "unit_t": 1.0}),
    ("mond", "multigrid", {"mond_g0": 1.2,
                           "mond_scale_factor_exponent": 0.0,
                           "unit_l": 3085.0, "unit_t": 1e10}),
])
def test_slab_step_theories_match_single_device(theory, solver_name, extra):
    """Fully sharded step (slab multigrid/FAS, halo'd MOND source) ==
    single-device pallas step for every gravity theory."""
    npart = M ** 3 // 4
    rng = np.random.default_rng(5)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.02 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": theory, "ncoarse": 5, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": solver_name,
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.2, "Om_m": 0.3, "epsrel": 1e-3,
        "particle_engine": "pallas",
    }
    param.update(extra)
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    dt = np.float32(2e-3)
    nsteps = 2

    mesh = _mesh()
    state = slab.distribute_particles(mesh, cfg, pos, vel)
    step_first = slab.make_slab_step(cfg, mesh, "leapfrog",
                                     first_call=True)
    step_next = slab.make_slab_step(cfg, mesh, "leapfrog")
    out = step_first(*state, dyn, np.float32(0))
    for _ in range(nsteps):
        out = step_next(*out[:6], dyn, dt)
        assert int(out[7].overflow) == 0
    got_p, got_v = slab.gather_particles(cfg, NDEV, out[0], out[1])

    # single-device reference: same schedule (first pm, then steps)
    phi0, u0 = solver_mod.empty_fields(cfg)
    p, v, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    state1 = (p, v, acc, phi, u)
    for _ in range(nsteps):
        o = integrate.step(cfg, "leapfrog", False, False, *state1, dyn, dt)
        state1 = o[:5]
    want_p, want_v = solver_mod.particles_to_rows(cfg, state1[0], state1[1])

    assert got_p.shape == want_p.shape
    oi = np.lexsort((got_p[:, 2], got_p[:, 1], got_p[:, 0]))
    oj = np.lexsort((want_p[:, 2], want_p[:, 1], want_p[:, 0]))
    np.testing.assert_allclose(got_p[oi], want_p[oj], atol=2e-6)
    scale = max(np.abs(want_v).max(), 1e-8)
    np.testing.assert_allclose(
        got_v[oi], want_v[oj], atol=2e-4 * scale, rtol=2e-3
    )


def test_run_slab_end_to_end(tmp_path):
    """pysco_tpu.run with parallel_mode='slab': full simulation on the
    8-device mesh -- snapshots and P(k) written, restartable format."""
    import pysco_tpu
    from pysco_tpu.cosmo import write_power_spectrum_table
    from pysco_tpu.utils import io as iostream

    pk_file = tmp_path / "pk.dat"
    write_power_spectrum_table(str(pk_file))
    base = tmp_path / "run"
    param = {
        "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
        "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
        "ncoarse": 5, "npart": 16 ** 3, "z_start": 49, "seed": 42,
        "position_ICS": "center", "fixed_ICS": False, "paired_ICS": False,
        "dealiased_ICS": False, "power_spectrum_file": str(pk_file),
        "initial_conditions": "2LPT", "base": str(base),
        "output_snapshot_format": "HDF5", "z_out": "[40]",
        "save_power_spectrum": "z_out", "integrator": "leapfrog",
        "mass_scheme": "TSC", "n_reorder": 50, "Courant_factor": 1.0,
        "max_aexp_stepping": 10, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "epsrel": 1e-2, "verbose": 1, "parallel_mode": "slab",
    }
    pysco_tpu.run(param)
    snaps = sorted(base.glob("output_*/particles_*"))
    assert len(snaps) >= 2  # initial + z=40
    pos, vel = iostream.read_snapshot_particles_hdf5(str(snaps[-1]))
    assert pos.shape == (16 ** 3, 3)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    assert ((pos >= 0) & (pos < 1)).all()
    pks = sorted(base.glob("power/pk_*.dat"))
    assert pks, "P(k) written at z_out"
    data = np.loadtxt(pks[-1])
    assert np.isfinite(data).all() and (data[:, 1] > 0).all()


def test_run_slab_restart(tmp_path, capsys):
    """Slab-mode restart from a snapshot written by a slab-mode run."""
    import pysco_tpu
    from pysco_tpu.cosmo import write_power_spectrum_table

    pk_file = tmp_path / "pk.dat"
    write_power_spectrum_table(str(pk_file))
    base = tmp_path / "run"
    param = {
        "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
        "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
        "ncoarse": 5, "npart": 16 ** 3, "z_start": 49, "seed": 42,
        "position_ICS": "center", "fixed_ICS": False, "paired_ICS": False,
        "dealiased_ICS": False, "power_spectrum_file": str(pk_file),
        "initial_conditions": "2LPT", "base": str(base),
        "output_snapshot_format": "HDF5", "z_out": "[44]",
        "save_power_spectrum": "no", "integrator": "leapfrog",
        "mass_scheme": "TSC", "n_reorder": 50, "Courant_factor": 1.0,
        "max_aexp_stepping": 10, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "epsrel": 1e-2, "verbose": 0, "parallel_mode": "slab",
    }
    pysco_tpu.run(dict(param))
    # restart from snapshot 1 and continue to z=42. parallel_mode is
    # deliberately OMITTED: the dispatch must honour the value restored
    # from the snapshot attrs (slab), not the pre-restore default
    param2 = dict(param)
    del param2["parallel_mode"]
    param2["initial_conditions"] = 1
    param2["z_out"] = "[42]"
    param2["verbose"] = 1  # the slab loop announces itself at WARNING
    capsys.readouterr()  # drop output from the first run
    pysco_tpu.run(param2)
    assert "slab mode:" in capsys.readouterr().err
    snaps = sorted(base.glob("output_*/particles_*"))
    assert len(snaps) >= 2


@pytest.mark.parametrize("n_dev", [1, 2])
def test_slab_step_small_meshes_match_single(n_dev):
    """1- and 2-device meshes: with n_dev==2 both ppermute neighbours are
    the SAME device, so a naive right/left mask pair selects identical
    particles and delivers every leaver twice (advisor finding, round 2);
    with n_dev==1 it would self-duplicate. Equivalence against the
    single-device step catches any duplication or loss."""
    npart = M ** 3 // 4
    rng = np.random.default_rng(7)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.05 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": "newton", "ncoarse": 5, "npart": npart,
        "mass_scheme": "cic", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    dt = np.float32(2e-3)
    nsteps = 3  # enough that boundary particles migrate

    mesh = slab.make_mesh(n_dev)
    pos_d, vel_d, acc_d, phi_d, u_d, ts_d = slab.distribute_particles(
        mesh, cfg, pos, vel
    )
    step_fn = slab.make_slab_step(cfg, mesh, "leapfrog")
    for _ in range(nsteps + 1):
        pos_d, vel_d, acc_d, phi_d, u_d, ts_d, _, diag = step_fn(
            pos_d, vel_d, acc_d, phi_d, u_d, ts_d, dyn, dt
        )
        assert int(diag.overflow) == 0
    got_p, got_v = slab.gather_particles(cfg, n_dev, pos_d, vel_d)
    assert got_p.shape[0] == npart  # no duplication, no loss

    phi0, u0 = solver_mod.empty_fields(cfg)
    p, v = pallas_pm.to_columns(jnp.asarray(pos), jnp.asarray(vel), npart)
    acc = jnp.zeros_like(p)
    state1 = (p, v, acc, phi0, u0)
    for _ in range(nsteps + 1):
        out = integrate.step(cfg, "leapfrog", False, False, *state1, dyn, dt)
        state1 = out[:5]
    want_p, want_v = solver_mod.particles_to_rows(cfg, state1[0], state1[1])

    oi = np.lexsort((got_p[:, 2], got_p[:, 1], got_p[:, 0]))
    oj = np.lexsort((want_p[:, 2], want_p[:, 1], want_p[:, 0]))
    np.testing.assert_allclose(got_p[oi], want_p[oj], atol=2e-6)
    np.testing.assert_allclose(got_v[oi], want_v[oj], atol=1e-4, rtol=1e-3)


def test_migrate_two_device_direction_split():
    """n_dev==2: leavers are split disjointly by which edge they crossed,
    so each direction keeps its own cap-sized buffer. Routing every
    leaver through the single right buffer (the round-2 fix's first
    form) halves effective migration capacity: cap right-edge crossers
    plus cap left-edge crossers must migrate with lost == 0."""
    n_dev, m = 2, 8
    pps = m // n_dev
    cap = 256
    ncols = 2 * cap + 256
    sent = pallas_pm.SENTINEL

    def plane(p):
        return (p + 0.5) / m  # NGP base == p exactly

    pos = np.full((2, 4, ncols), sent, np.float32)
    vel = np.zeros((2, 4, ncols), np.float32)
    pos[:, 3, :] = 0.0
    rng = np.random.default_rng(3)
    # shard 0: cap leavers through the right edge (plane pps) + cap
    # leavers through the wrapped left edge (plane m-1) + stayers.
    pos[0, 0, :cap] = plane(pps)
    pos[0, 0, cap:2 * cap] = plane(m - 1)
    pos[0, 0, 2 * cap:2 * cap + 100] = plane(1)
    pos[0, 1:3, :2 * cap + 100] = rng.random((2, 2 * cap + 100))
    # shard 1: stayers only.
    pos[1, 0, :50] = plane(pps + 1)
    pos[1, 1:3, :50] = rng.random((2, 50))
    n_real = 2 * cap + 100 + 50

    mesh = slab.make_mesh(n_dev)
    glob_p = jnp.asarray(np.concatenate(pos, axis=1))
    glob_v = jnp.asarray(np.concatenate(vel, axis=1))

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh,
                         in_specs=(P(None, "dp"), P(None, "dp")),
                         out_specs=(P(None, "dp"), P(None, "dp"), P("dp")),
                         check_vma=False)
    def run(p, v):
        p2, v2, lost = slab.migrate(p, v, m, pps, cap, n_dev, "ngp")
        return p2, v2, lost[None]

    p2, v2, lost = run(glob_p, glob_v)
    assert int(np.sum(lost)) == 0
    p2 = np.array(p2).reshape(4, n_dev, -1).swapaxes(0, 1)
    real = p2[:, 0] < pallas_pm.SENTINEL_MIN
    assert int(real.sum()) == n_real  # nothing lost, nothing duplicated
    # every real particle now sits on its destination shard
    for r in range(n_dev):
        px = np.floor(p2[r, 0][real[r]] * m).astype(int) % m
        assert (px // pps == r).all()


@pytest.mark.parametrize("cycle", ["F", "W"])
def test_slab_multigrid_cycles_match_single(cycle):
    """multigrid_cycle=F/W honoured in slab mode (round 2 silently ran V):
    sharded result == single-device result with the same cycle type."""
    npart = M ** 3 // 8
    rng = np.random.default_rng(11)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.02 * rng.standard_normal((npart, 3))).astype(np.float32)
    param = {
        "theory": "newton", "ncoarse": 5, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": "multigrid",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.2, "Om_m": 0.3, "epsrel": 1e-3,
        "particle_engine": "pallas", "multigrid_cycle": cycle,
    }
    cfg = solver_mod.config_from_param(param)
    assert cfg.multigrid_cycle == cycle
    dyn = solver_mod.compute_dynamics(param)
    dt = np.float32(2e-3)

    mesh = _mesh()
    state = slab.distribute_particles(mesh, cfg, pos, vel)
    out = slab.make_slab_step(cfg, mesh, "leapfrog", first_call=True)(
        *state, dyn, np.float32(0)
    )
    out = slab.make_slab_step(cfg, mesh, "leapfrog")(*out[:6], dyn, dt)
    got_p, got_v = slab.gather_particles(cfg, NDEV, out[0], out[1])

    phi0, u0 = solver_mod.empty_fields(cfg)
    p, v, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    o = integrate.step(cfg, "leapfrog", False, False, p, v, acc, phi, u,
                       dyn, dt)
    want_p, want_v = solver_mod.particles_to_rows(cfg, o[0], o[1])

    oi = np.lexsort((got_p[:, 2], got_p[:, 1], got_p[:, 0]))
    oj = np.lexsort((want_p[:, 2], want_p[:, 1], want_p[:, 0]))
    np.testing.assert_allclose(got_p[oi], want_p[oj], atol=2e-6)
    scale = max(np.abs(want_v).max(), 1e-8)
    np.testing.assert_allclose(
        got_v[oi], want_v[oj], atol=2e-4 * scale, rtol=2e-3
    )


@pytest.mark.parametrize("n_power", [2, 3])
def test_slab_fr_exact_root_sweeps_match_single(n_power):
    """fR_root_solver='exact' must use the f64 closed-form root on the
    SHARDED fine levels too (advisor: round 2 silently downgraded them to
    the Newton polish). Compare exact-root Gauss-Seidel sweeps cell for
    cell against the single-device exact sweeps (same global parity)."""
    from pysco_tpu.models import cubic, quartic
    from pysco_tpu.parallel import slab_mg

    rng = np.random.default_rng(13)
    q = -0.05
    u0 = (0.01 * (1 + 0.1 * rng.standard_normal((M, M, M)))).astype(
        np.float32
    )
    b = (0.02 * rng.standard_normal((M, M, M))).astype(np.float32)
    mesh = _mesh()
    make_ops = (slab_mg.fas_ops_cubic_slab if n_power == 2
                else slab_mg.fas_ops_quartic_slab)
    ops = make_ops(q, NDEV, exact_root=True)

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=(P("dp"), P("dp")),
                         out_specs=P("dp"), check_vma=False)
    def sweep_slab(u_local, b_local):
        return ops.smoothing(u_local, b_local, 2, None)

    got = np.array(sweep_slab(jnp.asarray(u0), jnp.asarray(b)))
    mod = cubic if n_power == 2 else quartic
    want = np.array(
        mod.smoothing(jnp.asarray(u0), jnp.asarray(b), q, 2,
                      exact_root=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


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
    pos_d, vel_d, acc_d, phi_d, u_d, ts_d = slab.distribute_particles(
        mesh, cfg, pos, vel
    )
    step_fn = slab.make_slab_step(cfg, mesh, "leapfrog")
    for _ in range(4):
        pos_d, vel_d, acc_d, phi_d, u_d, ts_d, _, diag = step_fn(
            pos_d, vel_d, acc_d, phi_d, u_d, ts_d, dyn, np.float32(2e-3)
        )
        assert int(diag.overflow) == 0
    got_p = slab.gather_particles(cfg, NDEV, pos_d)
    assert got_p.shape[0] == npart  # every particle accounted for


def test_slab_lazy_steps_match_single_device_lazy():
    """Slab presorted (lazy re-binning) steps -- stale bins, drift-widened
    kernels, both-way spill/halo exchange, no migration -- must track the
    single-device lazy path to float32 roundoff."""
    npart = M ** 3 // 4
    rng = np.random.default_rng(17)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.05 * rng.standard_normal((npart, 3))).astype(np.float32)
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
    # max|v| ~ 0.15 -> 0.3 cells/step at dt=2e-3: two lazy steps stay
    # within the 1-cell drift bound after the sorted step
    dt = np.float32(2e-3)

    mesh = _mesh()
    state = slab.distribute_particles(mesh, cfg, pos, vel)
    sorted_fn = slab.make_slab_step(cfg, mesh, "leapfrog")
    # levels 1, 2, 2: the production lazy_drift=2 cadence (0.3 cells/step
    # keeps the accumulated bound under each window)
    levels = (1, 2, 2)
    lazy_fns = {
        k: slab.make_slab_step(cfg, mesh, "leapfrog", presorted=k)
        for k in set(levels)
    }
    out = sorted_fn(*state, dyn, dt)
    for k in levels:
        out = lazy_fns[k](*out[:6], dyn, dt)
        assert int(out[7].overflow) == 0
    got_p, got_v = slab.gather_particles(cfg, NDEV, out[0], out[1])
    assert got_p.shape[0] == npart

    # single-device lazy reference with the same sort/skip pattern
    p, v = pallas_pm.to_columns(jnp.asarray(pos), jnp.asarray(vel), npart)
    acc = jnp.zeros_like(p)
    ntiles = M * (M // pallas_pm.YB)
    ts = jnp.zeros(ntiles + 1, jnp.int32)
    state1 = (p, v, acc, *solver_mod.empty_fields(cfg), ts)
    out1 = integrate.step_lazy(cfg, "leapfrog", False, False, *state1,
                               dyn, dt)
    for k in levels:
        out1 = integrate.step_lazy(cfg, "leapfrog", k, False,
                                   *out1[:6], dyn, dt)
        assert int(out1[7].overflow) == 0
    want_p, want_v = solver_mod.particles_to_rows(cfg, out1[0], out1[1])

    oi = np.lexsort((got_p[:, 2], got_p[:, 1], got_p[:, 0]))
    oj = np.lexsort((want_p[:, 2], want_p[:, 1], want_p[:, 0]))
    np.testing.assert_allclose(got_p[oi], want_p[oj], atol=2e-6)
    np.testing.assert_allclose(got_v[oi], want_v[oj], atol=1e-4, rtol=1e-3)


def test_overflow_aborts_by_default():
    """A nonzero overflow diagnostic must hard-fail the run (the reference
    can never lose a particle); on_particle_overflow=warn opts out."""
    from pysco_tpu.main import _handle_overflow

    _handle_overflow({}, 0, "nothing")  # zero never raises
    with pytest.raises(RuntimeError, match="mass is no longer conserved"):
        _handle_overflow({}, 3, "slab particle capacity overflow")
    # explicit opt-out logs and continues
    _handle_overflow({"on_particle_overflow": "warn"}, 3, "overflow")


def test_run_slab_rebalance(tmp_path):
    """Proactive capacity re-balancing: with a tiny headroom threshold the
    run grows the per-shard capacity (slack growth, on-device sentinel
    padding, re-trace) instead of ever risking the overflow abort -- and
    the physics is unaffected: the final snapshot matches a run without
    re-balancing."""
    import pysco_tpu
    from pysco_tpu.cosmo import write_power_spectrum_table
    from pysco_tpu.utils import io as iostream

    pk_file = tmp_path / "pk.dat"
    write_power_spectrum_table(str(pk_file))

    def run(base, headroom):
        param = {
            "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
            "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
            "ncoarse": 5, "npart": 16 ** 3, "z_start": 49, "seed": 42,
            "position_ICS": "center", "fixed_ICS": False,
            "paired_ICS": False, "dealiased_ICS": False,
            "power_spectrum_file": str(pk_file),
            "initial_conditions": "2LPT", "base": str(base),
            "output_snapshot_format": "HDF5", "z_out": "[47]",
            "save_power_spectrum": "no", "integrator": "leapfrog",
            "mass_scheme": "TSC", "n_reorder": 50, "Courant_factor": 1.0,
            "max_aexp_stepping": 10, "linear_newton_solver": "fft",
            "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
            "epsrel": 1e-2, "verbose": 1, "parallel_mode": "slab",
            "slab_rebalance_headroom": headroom,
        }
        pysco_tpu.run(param)
        snap = sorted(base.glob("output_*/particles_*"))[-1]
        attrs = iostream.read_hdf5_snapshot_attrs(str(snap))
        return attrs, iostream.read_snapshot_particles_hdf5(str(snap))

    attrs_r, (pos_r, vel_r) = run(tmp_path / "reb", 0.01)  # triggers now
    # the grown slack is persisted in the snapshot attrs (restart contract)
    assert float(attrs_r["slab_slack"]) > 1.25
    assert pos_r.shape == (16 ** 3, 3)  # every particle survived

    _, (pos_n, vel_n) = run(tmp_path / "base", 1.0)  # disabled
    oi = np.lexsort((pos_r[:, 2], pos_r[:, 1], pos_r[:, 0]))
    oj = np.lexsort((pos_n[:, 2], pos_n[:, 1], pos_n[:, 0]))
    np.testing.assert_allclose(pos_r[oi], pos_n[oj], atol=2e-6)
    np.testing.assert_allclose(
        vel_r[oi], vel_n[oj],
        atol=2e-4 * max(np.abs(vel_n).max(), 1e-8), rtol=2e-3,
    )


def test_slab_rejects_non_pallas_engine(tmp_path):
    """parallel_mode=slab only has the pallas transfer path; a configured
    scatter/dense engine must fail loudly, not be silently ignored."""
    import pytest as _pytest

    import pysco_tpu
    from pysco_tpu.cosmo import write_power_spectrum_table

    pk_file = tmp_path / "pk.dat"
    write_power_spectrum_table(str(pk_file))
    param = {
        "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
        "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
        "ncoarse": 5, "npart": 16 ** 3, "z_start": 49, "seed": 42,
        "position_ICS": "center", "fixed_ICS": False, "paired_ICS": False,
        "dealiased_ICS": False, "power_spectrum_file": str(pk_file),
        "initial_conditions": "2LPT", "base": str(tmp_path / "run"),
        "output_snapshot_format": "HDF5", "z_out": "[47]",
        "save_power_spectrum": "no", "integrator": "leapfrog",
        "mass_scheme": "TSC", "n_reorder": 50, "Courant_factor": 1.0,
        "max_aexp_stepping": 10, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "epsrel": 1e-2, "verbose": 0, "parallel_mode": "slab",
        "particle_engine": "scatter",
    }
    with _pytest.raises(NotImplementedError, match="slab"):
        pysco_tpu.run(param)
