"""Pallas tile-binned particle engine vs the scatter reference
(interpreter mode on CPU; compiled mode is exercised on real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu.ops import mesh, pallas_pm


def _padded(pos, m, scheme, n_real):
    """Build the persistently padded state and tile-sort it."""
    extra = pallas_pm.padded_size(n_real, m) - n_real
    pos_p = jnp.concatenate([pos, jnp.full((extra, 3), 2.0, jnp.float32)])
    flags = jnp.concatenate(
        [jnp.ones(n_real, jnp.float32), jnp.zeros(extra, jnp.float32)]
    )
    return pallas_pm.sort_by_tile_padded(pos_p, flags, m, scheme)


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
    n = 3000
    pos = _particles(n, clustered=clustered)
    pos_s, flags, starts = _padded(pos, m, scheme, n)
    assert (np.array(starts) % pallas_pm.Q == 0).all()
    grid = pallas_pm.deposit(pos_s, flags, starts, m, scheme, True)
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
    pos_s, flags, starts = _padded(pos, m, scheme, n)
    got = pallas_pm.gather_vec(field, pos_s, flags, starts, scheme, True)
    ref = np.array(mesh.gather_vec(field, pos_s, scheme))
    real = np.array(flags) > 0
    np.testing.assert_allclose(
        np.array(got)[real], ref[real], atol=1e-4, rtol=1e-3
    )
    # pad rows come back zeroed
    assert np.abs(np.array(got)[~real]).max() == 0.0


def test_padded_sort_payload_and_alignment():
    m = 16
    n = 1000
    pos = _particles(n, seed=3)
    vel = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, 3)).astype(np.float32)
    )
    extra = pallas_pm.padded_size(n, m) - n
    pos_p = jnp.concatenate([pos, jnp.full((extra, 3), 2.0, jnp.float32)])
    vel_p = jnp.concatenate([vel, jnp.zeros((extra, 3), jnp.float32)])
    flags = jnp.concatenate(
        [jnp.ones(n, jnp.float32), jnp.zeros(extra, jnp.float32)]
    )
    pos_s, flags_s, vel_s, starts = pallas_pm.sort_by_tile_padded(
        pos_p, flags, m, "tsc", vel_p
    )
    starts = np.array(starts)
    assert (starts % pallas_pm.Q == 0).all()
    assert float(jnp.sum(flags_s)) == n
    real = np.array(flags_s) > 0
    lookup = {tuple(p): tuple(v) for p, v in zip(np.array(pos), np.array(vel))}
    for p, v in zip(np.array(pos_s)[real], np.array(vel_s)[real]):
        assert lookup[tuple(p)] == tuple(v)
    # every real particle is inside its tile's padded range
    nby = m // pallas_pm.YB
    keys = []
    for p in np.array(pos_s)[real]:
        xs, ys = p[0] * m, p[1] * m
        px = (int(np.floor(xs)) - 1) % m
        py = ((int(np.floor(ys)) - 1) % m) // pallas_pm.YB
        keys.append(px * nby + py)
    keys = np.array(keys)
    assert (np.diff(keys) >= 0).all()
