"""Unit tests for mesh <-> particle operators against NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu.ops import mesh


def _rand_positions(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, 3), dtype=np.float32)


# ---------------------------------------------------------------------------
# Deposition
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
def test_deposit_mass_conservation(scheme):
    pos = _rand_positions(1000)
    grid = mesh.deposit(jnp.asarray(pos), 8, scheme)
    assert grid.dtype == jnp.float32
    np.testing.assert_allclose(float(grid.sum()), 1000.0, rtol=1e-4)


def _cic_oracle(pos, n):
    grid = np.zeros((n, n, n), dtype=np.float64)
    for x, y, z in pos.astype(np.float64):
        idx = []
        for c in (x, y, z):
            xp = c * n
            i = int(xp)
            d = xp - 0.5 - i
            s = int(np.sign(d))
            idx.append([(i, 1 - abs(d)), ((i + s) % n, abs(d))])
        for i, wi in idx[0]:
            for j, wj in idx[1]:
                for k, wk in idx[2]:
                    grid[i, j, k] += wi * wj * wk
    return grid


def _tsc_oracle(pos, n):
    grid = np.zeros((n, n, n), dtype=np.float64)
    for x, y, z in pos.astype(np.float64):
        idx = []
        for c in (x, y, z):
            xp = c * n
            i = int(xp)
            d = xp - 0.5 - i
            idx.append(
                [
                    ((i - 1) % n, 0.5 * (0.5 - d) ** 2),
                    (i, 0.75 - d * d),
                    ((i + 1) % n, 0.5 * (0.5 + d) ** 2),
                ]
            )
        for i, wi in idx[0]:
            for j, wj in idx[1]:
                for k, wk in idx[2]:
                    grid[i, j, k] += wi * wj * wk
    return grid


def test_deposit_cic_matches_oracle():
    pos = _rand_positions(200, seed=1)
    got = np.asarray(mesh.deposit_cic(jnp.asarray(pos), 8))
    want = _cic_oracle(pos, 8)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_deposit_tsc_matches_oracle():
    pos = _rand_positions(200, seed=2)
    got = np.asarray(mesh.deposit_tsc(jnp.asarray(pos), 8))
    want = _tsc_oracle(pos, 8)
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# Interpolation (gather)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
def test_gather_constant_field(scheme):
    pos = _rand_positions(500, seed=3)
    grid = jnp.full((8, 8, 8), 3.25, jnp.float32)
    vals = mesh.gather(grid, jnp.asarray(pos), scheme)
    np.testing.assert_allclose(np.asarray(vals), 3.25, rtol=1e-5)


def test_gather_adjoint_of_deposit():
    """<deposit(p), g> == sum_p gather(g, p) for matching schemes."""
    pos = _rand_positions(100, seed=4)
    rng = np.random.default_rng(5)
    grid = rng.random((8, 8, 8)).astype(np.float32)
    for scheme in ("cic", "tsc"):
        dep = np.asarray(mesh.deposit(jnp.asarray(pos), 8, scheme))
        gat = np.asarray(mesh.gather(jnp.asarray(grid), jnp.asarray(pos), scheme))
        np.testing.assert_allclose(
            np.vdot(dep, grid), gat.sum(), rtol=1e-4
        )


def test_gather_vec_matches_scalar():
    pos = _rand_positions(50, seed=6)
    rng = np.random.default_rng(7)
    vec = rng.random((8, 8, 8, 3)).astype(np.float32)
    got = np.asarray(mesh.gather_vec(jnp.asarray(vec), jnp.asarray(pos), "tsc"))
    for c in range(3):
        want = np.asarray(
            mesh.gather(jnp.asarray(vec[..., c]), jnp.asarray(pos), "tsc")
        )
        np.testing.assert_allclose(got[:, c], want, rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Stencils
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order,rtol", [(3, 0.05), (5, 0.005), (7, 5e-4)])
def test_derivative_accuracy(order, rtol):
    n = 32
    x = np.arange(n) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    f = np.sin(2 * np.pi * X).astype(np.float32)
    grad = np.asarray(mesh.derivative(jnp.asarray(f), order))
    expected = 2 * np.pi * np.cos(2 * np.pi * X)
    np.testing.assert_allclose(grad[..., 0], expected, atol=rtol * 2 * np.pi)
    np.testing.assert_allclose(grad[..., 1], 0, atol=1e-3)


def test_derivative_fr_equals_combined():
    rng = np.random.default_rng(8)
    a = rng.random((8, 8, 8)).astype(np.float32)
    b = rng.random((8, 8, 8)).astype(np.float32)
    f = np.float32(0.7)
    got = np.asarray(mesh.derivative_fR(jnp.asarray(a), jnp.asarray(b), f, 1, 5))
    want = np.asarray(mesh.derivative(jnp.asarray(a + f * b * b), 5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Multigrid transfer operators
# ---------------------------------------------------------------------------

def test_restriction_oracle():
    rng = np.random.default_rng(9)
    x = rng.random((8, 8, 8)).astype(np.float32)
    got = np.asarray(mesh.restriction(jnp.asarray(x)))
    want = 0.125 * (
        x[::2, ::2, ::2] + x[::2, ::2, 1::2] + x[::2, 1::2, ::2]
        + x[::2, 1::2, 1::2] + x[1::2, ::2, ::2] + x[1::2, ::2, 1::2]
        + x[1::2, 1::2, ::2] + x[1::2, 1::2, 1::2]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _prolongation_oracle(x):
    n = x.shape[0]
    out = np.zeros((2 * n, 2 * n, 2 * n), dtype=np.float64)
    w = {0: 27 / 64, 1: 9 / 64, 2: 3 / 64, 3: 1 / 64}
    for i in range(n):
        for j in range(n):
            for k in range(n):
                for si in (0, 1):
                    for sj in (0, 1):
                        for sk in (0, 1):
                            val = 0.0
                            for di in (0, 1):
                                ii = (i + (1 if si else -1) * di) % n
                                for dj in (0, 1):
                                    jj = (j + (1 if sj else -1) * dj) % n
                                    for dk in (0, 1):
                                        kk = (k + (1 if sk else -1) * dk) % n
                                        val += w[di + dj + dk] * x[ii, jj, kk]
                            out[2 * i + si, 2 * j + sj, 2 * k + sk] = val
    return out


def test_prolongation_oracle():
    rng = np.random.default_rng(10)
    x = rng.random((4, 4, 4)).astype(np.float32)
    got = np.asarray(mesh.prolongation(jnp.asarray(x)))
    want = _prolongation_oracle(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_restriction_prolongation_constant():
    x = jnp.full((4, 4, 4), 2.0, jnp.float32)
    np.testing.assert_allclose(np.asarray(mesh.prolongation(x)), 2.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mesh.restriction(mesh.prolongation(x))), 2.0, rtol=1e-6
    )


# ---------------------------------------------------------------------------
# Particle utilities
# ---------------------------------------------------------------------------

def test_periodic_wrap():
    x = jnp.asarray(
        np.array([[-0.25, 1.25, 0.5], [1.0, -1e-9, 0.999999]], dtype=np.float32)
    )
    got = np.asarray(mesh.periodic_wrap(x))
    np.testing.assert_allclose(
        got, [[0.75, 0.25, 0.5], [0.0, 0.0, 0.999999]], atol=1e-6
    )
    assert (got >= 0).all() and (got < 1).all()


def test_reorder_preserves_particles():
    pos = _rand_positions(500, seed=11)
    vel = _rand_positions(500, seed=12)
    p2, v2 = mesh.reorder_particles(jnp.asarray(pos), jnp.asarray(vel))
    p2, v2 = np.asarray(p2), np.asarray(v2)
    assert sorted(map(tuple, p2)) == sorted(map(tuple, pos))
    # velocity rows stay attached to their position rows
    lookup = {tuple(p): tuple(v) for p, v in zip(pos, vel)}
    for p, v in zip(p2, v2):
        assert lookup[tuple(p)] == tuple(v)


def test_morton_keys_locality():
    pos = _rand_positions(4096, seed=13)
    keys = np.asarray(mesh.morton_keys(jnp.asarray(pos)))
    order = np.argsort(keys)
    sorted_pos = pos[order]
    dists = np.linalg.norm(np.diff(sorted_pos, axis=0), axis=1)
    rng = np.random.default_rng(14)
    shuffled = pos[rng.permutation(len(pos))]
    dists_rand = np.linalg.norm(np.diff(shuffled, axis=0), axis=1)
    assert dists.mean() < 0.5 * dists_rand.mean()
