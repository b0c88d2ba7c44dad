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


@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
@pytest.mark.parametrize("clustered", [False, True])
def test_pallas_deposit_matches_scatter(scheme, clustered):
    m = 32  # nby > 2 so block-spill roll directions are exercised
    pos = _particles(3000, clustered=clustered)
    pos_s, starts = pallas_pm.sort_by_tile(pos, m, scheme)
    grid = pallas_pm.deposit(pos_s, starts, m, scheme, True)
    ref = mesh.deposit(pos, m, scheme)
    np.testing.assert_allclose(float(grid.sum()), 3000.0, rtol=1e-5)
    np.testing.assert_allclose(np.array(grid), np.array(ref), atol=2e-4)


@pytest.mark.parametrize("scheme", ["ngp", "cic", "tsc"])
def test_pallas_gather_matches_scatter(scheme):
    m = 32
    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.random((m, m, m, 3)).astype(np.float32))
    pos = _particles(2000, seed=2)
    pos_s, starts = pallas_pm.sort_by_tile(pos, m, scheme)
    got = pallas_pm.gather_vec(field, pos_s, starts, scheme, True)
    ref = mesh.gather_vec(field, pos_s, scheme)
    np.testing.assert_allclose(np.array(got), np.array(ref),
                               atol=1e-4, rtol=1e-3)


def test_sort_by_tile_payload():
    m = 16
    pos = _particles(1000, seed=3)
    vel = jnp.asarray(
        np.random.default_rng(4).standard_normal((1000, 3)).astype(np.float32)
    )
    pos_s, vel_s, starts = pallas_pm.sort_by_tile(pos, m, "tsc", vel)
    lookup = {tuple(p): tuple(v) for p, v in zip(np.array(pos), np.array(vel))}
    for p, v in zip(np.array(pos_s), np.array(vel_s)):
        assert lookup[tuple(p)] == tuple(v)
    starts = np.array(starts)
    assert starts[0] == 0 and starts[-1] == 1000
    assert (np.diff(starts) >= 0).all()
