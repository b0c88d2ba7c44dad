"""Packed red-black half-lattice smoothers vs the masked checkerboard sweeps.

The packed implementations (laplacian._smoothing_packed, cubic.smoothing,
quartic.smoothing) must be BIT-IDENTICAL to iterating the masked
gauss_seidel sweeps: same update order, same float summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysco_tpu.models import cubic, laplacian as lap, quartic


def _grid(n, seed=0, positive=False):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n, n)).astype(np.float32)
    if positive:
        a = np.abs(a) + 0.5
    return jnp.asarray(a)


@pytest.mark.parametrize("n", [8, 16])
def test_pack_unpack_roundtrip(n):
    x = _grid(n)
    red, black = lap.pack_rb(x)
    assert red.shape == (n, n // 2, n)
    assert np.array_equal(np.array(lap.unpack_rb(red, black)), np.array(x))


def test_pack_separates_parities():
    n = 8
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    parity = ((i + j + k) & 1).astype(np.float32)  # 1 on red cells
    red, black = lap.pack_rb(jnp.asarray(parity))
    assert np.all(np.array(red) == 1.0)
    assert np.all(np.array(black) == 0.0)


@pytest.mark.parametrize("to_red", [True, False])
def test_packed_neighbour_sum_matches_full(to_red):
    n = 16
    x = _grid(n, seed=1)
    full = lap.neighbour_sum(x)
    red, black = lap.pack_rb(x)
    want = lap.pack_rb(full)[0 if to_red else 1]
    got = lap.packed_neighbour_sum(black if to_red else red, to_red)
    # the y-neighbour contributions cross colours, so the packed sum only
    # matches the full sum's same-colour slots exactly
    assert np.array_equal(np.array(got), np.array(want))


@pytest.mark.parametrize("nsweeps", [1, 3])
@pytest.mark.parametrize("with_rhs", [False, True])
def test_linear_smoothing_bitwise(nsweeps, with_rhs):
    n = 16
    x = _grid(n, seed=2)
    b = _grid(n, seed=3)
    rhs = _grid(n, seed=4) if with_rhs else None

    want = x
    for _ in range(nsweeps):
        if with_rhs:
            want = lap.gauss_seidel_with_rhs(want, b, rhs)
        else:
            want = lap.gauss_seidel(want, b)

    if with_rhs:
        got = lap.smoothing_with_rhs(x, b, nsweeps, rhs)
    else:
        got = lap.smoothing(x, b, nsweeps)
    assert np.array_equal(np.array(got), np.array(want))


@pytest.mark.parametrize("mod", [cubic, quartic], ids=["cubic", "quartic"])
@pytest.mark.parametrize("exact_root", [False, True])
@pytest.mark.parametrize("with_rhs", [False, True])
def test_scalaron_smoothing_bitwise(mod, exact_root, with_rhs):
    n = 8
    q = -0.05
    x = _grid(n, seed=5, positive=True) * 0.1
    b = _grid(n, seed=6)
    rhs = 0.01 * _grid(n, seed=7) if with_rhs else None
    nsweeps = 2

    want = x
    for _ in range(nsweeps):
        want = mod.gauss_seidel(want, b, q, rhs, exact_root=exact_root)
    got = mod.smoothing(x, b, q, nsweeps, rhs, exact_root=exact_root)
    assert np.array_equal(np.array(got), np.array(want))


def test_packed_smoothing_converges():
    """Sanity: packed sweeps actually reduce the Poisson residual."""
    n = 16
    b = _grid(n, seed=8)
    b = b - jnp.mean(b)
    x = lap.initialise_potential(b)
    e0 = float(lap.residual_error(x, b))
    x = lap.smoothing(x, b, 20)
    e1 = float(lap.residual_error(x, b))
    assert e1 < 0.5 * e0


def test_packed_smoothing_under_jit():
    """The packed path must trace under jit and agree with the masked
    sweeps jitted in the same program (eager-vs-jit may differ by FMA
    contraction, so both sides are compiled together)."""
    n = 8
    x = _grid(n, seed=9)
    b = _grid(n, seed=10)

    @jax.jit
    def both(x_, b_):
        packed = lap.smoothing(x_, b_, 2)
        masked = lap.gauss_seidel(lap.gauss_seidel(x_, b_), b_)
        return packed, masked

    got, want = both(x, b)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-6, atol=1e-6)
