"""Pallas tile-binned particle engine vs the scatter reference
(interpreter mode on CPU; compiled mode is exercised on real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu.ops import mesh, pallas_pm


def _particles(n, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 3), dtype=np.float32)
    if clustered:
        pos[: n // 2] = 0.2 + 0.25 * pos[: n // 2]
    return jnp.asarray(pos)


def _columns(pos, m, scheme, n_real, seed=10):
    """Column state + tile sort (velocity rides along)."""
    vel = jnp.asarray(
        np.random.default_rng(seed).standard_normal(
            (n_real, 3)
        ).astype(np.float32)
    )
    pos_c, vel_c = pallas_pm.to_columns(pos, vel, n_real)
    return pallas_pm.sort_particles(pos_c, vel_c, m, scheme)


@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
@pytest.mark.parametrize("clustered", [False, True])
def test_pallas_deposit_matches_scatter(scheme, clustered):
    m = 32  # nby > 2 so block-spill roll directions are exercised
    n = 3000  # not a multiple of Q: exercises the sentinel tail
    pos = _particles(n, clustered=clustered)
    pos_s, _, starts = _columns(pos, m, scheme, n)
    grid = pallas_pm.deposit(pos_s, starts, m, scheme, True)
    ref = mesh.deposit(pos, m, scheme)
    np.testing.assert_allclose(float(grid.sum()), float(n), rtol=1e-5)
    np.testing.assert_allclose(np.array(grid), np.array(ref), atol=2e-4)


@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
def test_pallas_gather_matches_scatter(scheme):
    m = 32
    n = 2000
    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.random((m, m, m, 3)).astype(np.float32))
    pos = _particles(n, seed=2)
    pos_s, _, starts = _columns(pos, m, scheme, n)
    got = np.array(
        pallas_pm.gather_vec(field, pos_s, starts, scheme, True)
    )[:3].T  # (N_up, 3)
    ref = np.array(
        mesh.gather_vec(field, jnp.asarray(np.array(pos_s)[:3].T[:n]),
                        scheme)
    )
    np.testing.assert_allclose(got[:n], ref, atol=1e-4, rtol=1e-3)
    # sentinel tail columns come back zeroed
    assert np.abs(got[n:]).max() == 0.0


def test_sort_payload_and_binning():
    m = 16
    n = 1000  # not a multiple of Q
    pos = _particles(n, seed=3)
    vel = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, 3)).astype(np.float32)
    )
    pos_c, vel_c = pallas_pm.to_columns(pos, vel, n)
    pos_s, vel_s, starts = pallas_pm.sort_particles(pos_c, vel_c, m, "tsc")
    starts = np.array(starts)
    assert starts[-1] == n  # sentinel tail sorts past every tile
    assert pos_s.shape == (4, pallas_pm.padded_cols(n))
    p_rows = np.array(pos_s)[:3].T
    v_rows = np.array(vel_s)[:3].T
    # velocity stayed aligned with its particle through the sort
    lookup = {tuple(p): tuple(v) for p, v in zip(np.array(pos), np.array(vel))}
    for p, v in zip(p_rows[:n], v_rows[:n]):
        assert lookup[tuple(p)] == tuple(v)
    # keys are nondecreasing and every particle is inside its tile range
    nby = m // pallas_pm.YB
    keys = []
    for p in p_rows[:n]:
        xs, ys = p[0] * m, p[1] * m
        px = (int(np.floor(xs)) - 1) % m
        py = ((int(np.floor(ys)) - 1) % m) // pallas_pm.YB
        keys.append(px * nby + py)
    keys = np.array(keys)
    assert (np.diff(keys) >= 0).all()
    for t in range(m * nby):
        seg = keys[starts[t]: starts[t + 1]]
        assert (seg == t).all()
    # the sentinel tail survives a periodic wrap (drift step)
    wrapped = mesh.periodic_wrap(pos_s + 0.001)
    assert float(jnp.min(wrapped[:3, n:])) >= pallas_pm.SENTINEL_MIN


@pytest.mark.parametrize("scheme,drift,cells", [
    ("cic", 1, 0.9), ("tsc", 1, 0.9), ("cic", 2, 1.9), ("tsc", 2, 1.9),
])
def test_lazy_rebinning_drifted_particles(scheme, drift, cells):
    """CFL-bounded lazy re-binning: after sorting, drift every particle by
    up to ~(drift - 0.1) cells WITHOUT re-sorting; the drift-widened
    kernels must still deposit/gather exactly (vs the scatter oracle at
    the drifted positions)."""
    m = 32
    n = 3000
    rng = np.random.default_rng(6)
    pos = _particles(n, seed=6, clustered=True)
    pos_s, _, starts = _columns(pos, m, scheme, n)
    # drift every particle by up to `cells` cells per axis, with wrap
    delta = jnp.asarray(
        (cells / m * (2 * rng.random((3, pos_s.shape[1])) - 1)).astype(
            np.float32
        )
    )
    from pysco_tpu.ops.mesh import periodic_wrap

    drifted = pos_s.at[:3].add(delta)
    drifted = periodic_wrap(drifted)

    grid = pallas_pm.deposit(drifted, starts, m, scheme, True, drift=drift)
    real = np.array(drifted)[0] < pallas_pm.SENTINEL_MIN
    ref = mesh.deposit(jnp.asarray(np.array(drifted)[:3, real].T), m, scheme)
    # sum in float64: a float32 jnp.sum over the grid carries ~1e-2
    # accumulation noise at this size
    np.testing.assert_allclose(
        np.array(grid, dtype=np.float64).sum(), float(n), rtol=1e-6
    )
    np.testing.assert_allclose(np.array(grid), np.array(ref), atol=2e-4)

    field = jnp.asarray(rng.random((3, m, m, m)).astype(np.float32))
    got = np.array(
        pallas_pm.gather_vec_cl(field, drifted, starts, scheme, True,
                                drift=drift)
    )[:3].T
    ref_g = np.array(
        mesh.gather_vec(jnp.moveaxis(field, 0, -1),
                        jnp.asarray(np.array(drifted)[:3, real].T), scheme)
    )
    np.testing.assert_allclose(got[real], ref_g, atol=1e-4, rtol=1e-3)


def test_lazy_step_trajectory_matches_sorted():
    """integrate.step_lazy with presorted=True (stale bins, widened
    windows) must track the always-sorted trajectory to float32
    tolerance over several steps."""
    import jax

    from pysco_tpu import integrate, solver as solver_mod

    n = 16
    npart = n ** 3
    rng = np.random.default_rng(12)
    pos = jnp.asarray(rng.random((npart, 3), dtype=np.float32))
    vel = jnp.asarray(
        (0.3 * rng.standard_normal((npart, 3))).astype(np.float32)
    )
    param = {
        "theory": "newton", "ncoarse": 4, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    p0, v0, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, pos, vel, phi0, u0, dyn
    )
    # dt such that per-step drift stays well under a cell (max|v|*dt*n)
    dt = np.float32(0.5 / (float(jnp.max(jnp.abs(v0))) * n))
    nsteps = 4

    # reference: always-sorted step
    state = (p0, v0, acc, phi, u)
    for _ in range(nsteps):
        out = integrate.step(cfg, "leapfrog", False, False, *state, dyn, dt)
        state = out[:5]
    want_p, want_v = solver_mod.particles_to_rows(cfg, state[0], state[1])

    # lazy with lazy_drift=2 windows: sort on step 0, then levels 1, 2, 2
    # (cum bound 0.55, 1.1, 1.65 -- the production sort-every-4th cadence)
    from pysco_tpu.main import _drift_level

    ntiles = n * (n // pallas_pm.YB)
    tstarts = jnp.zeros(ntiles + 1, jnp.int32)
    lstate = (p0, v0, acc, phi, u, tstarts)
    cum = np.inf
    levels = []
    for _ in range(nsteps):
        presorted = _drift_level(cum + 0.55, 2)
        levels.append(presorted)
        out = integrate.step_lazy(
            cfg, "leapfrog", presorted, False, *lstate, dyn, dt
        )
        lstate = out[:6]
        cum = cum + 0.55 if presorted else 0.0
    assert levels == [0, 1, 2, 2]
    got_p, got_v = solver_mod.particles_to_rows(cfg, lstate[0], lstate[1])

    oi = np.lexsort((got_p[:, 2], got_p[:, 1], got_p[:, 0]))
    oj = np.lexsort((want_p[:, 2], want_p[:, 1], want_p[:, 0]))
    np.testing.assert_allclose(got_p[oi], want_p[oj], atol=2e-6)
    scale = np.abs(want_v).max()
    np.testing.assert_allclose(
        got_v[oi], want_v[oj], atol=3e-4 * scale, rtol=3e-3
    )


def test_drift_violations_counter():
    """Device-side detection of a violated lazy drift bound: particles
    whose base cell moved beyond the widened window must be counted (they
    silently deposit nothing), in-bound drifts must not."""
    m = 32
    n = 2048
    pos = _particles(n, seed=21)
    pos_s, _, starts = _columns(pos, m, "cic", n)

    # within the bound: drift every particle by < 1 cell
    drifted = mesh.periodic_wrap(pos_s.at[:3].add(jnp.float32(0.8 / m)))
    assert int(pallas_pm.drift_violations(drifted, starts, m, "cic", 1)) == 0

    # violate the bound for exactly 3 particles (move x by 3 cells)
    bad = np.array(drifted)
    bad[0, :3] = (bad[0, :3] + 3.0 / m) % 1.0
    count = int(pallas_pm.drift_violations(
        jnp.asarray(bad), starts, m, "cic", 1
    ))
    assert count == 3

    # and the violating particles really do vanish from the deposit
    grid = pallas_pm.deposit(jnp.asarray(bad), starts, m, "cic", True,
                             drift=1)
    np.testing.assert_allclose(
        np.array(grid, dtype=np.float64).sum(), float(n - count), rtol=1e-6
    )


def _tile_multisets(pos_s, starts):
    """Per-tile sets of particle columns (order within a tile is
    unspecified across sort strategies)."""
    pos_np = np.array(pos_s)
    starts_np = np.array(starts)
    out = []
    for t in range(len(starts_np) - 1):
        cols = pos_np[:3, starts_np[t]:starts_np[t + 1]]
        order = np.lexsort((cols[2], cols[1], cols[0]))
        out.append(cols[:, order])
    return out


@pytest.mark.parametrize("mode", ["nearly", "index", "nearly_index"])
@pytest.mark.parametrize("scenario", ["random", "drifted"])
def test_sort_modes_match_full(scenario, mode):
    """Every sort_mode must yield an exactly tile-sorted state whether
    the two-round displacement bound holds (drifted: small perturbation
    of a sorted state) or not (random: the cond fallback path)."""
    m = 32
    n = 4096 * 4  # power of two so the block sort engages (B=2^13)
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.random((n, 3), dtype=np.float32))
    vel = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    pos_c, vel_c = pallas_pm.to_columns(pos, vel, n)
    if scenario == "drifted":
        # start from a sorted state and drift by < 1 cell
        pos_c, vel_c, _ = pallas_pm.sort_particles(pos_c, vel_c, m, "tsc")
        drift = 0.4 / m * rng.standard_normal((4, n)).astype(np.float32)
        pos_c = jnp.asarray((np.array(pos_c) + drift) % 1.0)
        pos_c = pos_c.at[3].set(0.0)

    got_p, got_v, got_s = pallas_pm.sort_particles(
        pos_c, vel_c, m, "tsc", mode=mode, block=4096
    )
    want_p, want_v, want_s = pallas_pm.sort_particles(
        pos_c, vel_c, m, "tsc"
    )
    keys = np.array(pallas_pm.tile_keys(got_p, m, "tsc", 0, m))
    assert np.all(np.diff(keys) >= 0), "output not tile-sorted"
    np.testing.assert_array_equal(np.array(got_s), np.array(want_s))
    for a, b in zip(_tile_multisets(got_p, got_s),
                    _tile_multisets(want_p, want_s)):
        np.testing.assert_array_equal(a, b)
    # pos-vel pairing survives the permutation (the index modes permute
    # pos and vel in separate take() calls): the global multiset of
    # (pos, vel) column 6-tuples must match the input's exactly.
    def _pairs(p, v):
        cols = np.concatenate((np.array(p)[:3], np.array(v)[:3]))
        return cols[:, np.lexsort(cols)]

    np.testing.assert_array_equal(_pairs(got_p, got_v),
                                  _pairs(pos_c, vel_c))
