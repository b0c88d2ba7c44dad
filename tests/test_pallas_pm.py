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
