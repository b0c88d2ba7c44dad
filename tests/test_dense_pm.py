"""Dense (scatter-free) particle engine vs the scatter reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu.ops import dense_pm, mesh


def _particles(n, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 3), dtype=np.float32)
    if clustered:
        # squeeze a quarter of the particles into a thin slab (plane
        # overdensity ~2x mean: inside capacity, outside uniformity)
        pos[: n // 4, 0] = 0.25 + 0.2 * pos[: n // 4, 0]
    return jnp.asarray(pos)


@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
@pytest.mark.parametrize("clustered", [False, True])
def test_dense_deposit_matches_scatter(scheme, clustered):
    m = 16
    pos = _particles(4096, clustered=clustered)
    pos_s, starts = dense_pm.sort_by_plane(pos, m, scheme)
    grid, overflow = dense_pm.deposit(pos_s, starts, m, scheme)
    assert int(overflow) == 0
    ref = mesh.deposit(pos, m, scheme)
    np.testing.assert_allclose(np.array(grid), np.array(ref), atol=2e-4)
    np.testing.assert_allclose(float(grid.sum()), 4096.0, rtol=1e-5)


@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
def test_dense_gather_matches_scatter(scheme):
    m = 16
    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.random((m, m, m, 3)).astype(np.float32))
    pos = _particles(2048, seed=2)
    pos_s, starts = dense_pm.sort_by_plane(pos, m, scheme)
    got = dense_pm.gather_vec(field, pos_s, starts, scheme)
    ref = mesh.gather_vec(field, pos_s, scheme)
    np.testing.assert_allclose(np.array(got), np.array(ref),
                               atol=5e-5, rtol=1e-4)


def test_sort_by_plane_payload_alignment():
    m = 8
    pos = _particles(512, seed=3)
    vel = jnp.asarray(
        np.random.default_rng(4).standard_normal((512, 3)).astype(np.float32)
    )
    pos_s, vel_s, starts = dense_pm.sort_by_plane(pos, m, "tsc", vel)
    # rows stay attached
    lookup = {tuple(p): tuple(v) for p, v in zip(np.array(pos), np.array(vel))}
    for p, v in zip(np.array(pos_s), np.array(vel_s)):
        assert lookup[tuple(p)] == tuple(v)
    # starts are consistent plane boundaries (tsc key = base-1 mod m)
    keys = ((np.array(pos_s)[:, 0] * m).astype(int) - 1) % m
    assert (np.diff(keys) >= 0).all()
    starts = np.array(starts)
    for i in range(m):
        assert (keys[starts[i]:starts[i + 1]] == i).all()


def test_dense_deposit_capacity_overflow_detected():
    # all particles in one plane, capacity forced below the count
    m = 16
    n = 4096
    rng = np.random.default_rng(5)
    pos = rng.random((n, 3), dtype=np.float32)
    pos = pos.at[:, 0].set(pos[:, 0] / m) if hasattr(pos, "at") else pos
    pos = np.array(pos)
    pos[:, 0] = pos[:, 0] / m  # everything in plane 0
    pos_s, starts = dense_pm.sort_by_plane(jnp.asarray(pos), m, "tsc")
    grid, overflow = dense_pm.deposit(pos_s, starts, m, "tsc")
    # capacity is 1.25 * n / m + slack << n, so overflow must trigger
    assert int(overflow) > 0
