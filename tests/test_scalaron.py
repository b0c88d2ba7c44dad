"""f(R) cubic/quartic root solvers and FAS scalaron solve tests."""

import numpy as np
import jax.numpy as jnp

from pysco_tpu.models import cubic, multigrid, quartic


def test_cubic_roots_satisfy_equation():
    rng = np.random.default_rng(0)
    p = jnp.asarray((rng.random(1000) * 2 - 2.5).astype(np.float32))  # mostly <0
    q = -0.3
    d1 = 27.0 * q
    u = cubic.solution_cubic_equation(p, d1)
    resid = np.asarray(u ** 3 + p * u + q)
    np.testing.assert_allclose(resid, 0, atol=1e-10)


def test_cubic_initialise_potential_solves_zero_neighbour_case():
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.random((8, 8, 8)).astype(np.float32) + 0.5)
    q = -2000.0  # typical scalaron magnitudes are q*h^2 ~ -1e1..1e-3
    u = cubic.initialise_potential(b, q)
    n = 8
    h2 = 1.0 / n ** 2
    resid = np.asarray(u, dtype=np.float64) ** 3 + h2 * np.asarray(
        b, dtype=np.float64
    ) * np.asarray(u, dtype=np.float64) + h2 * q
    np.testing.assert_allclose(resid, 0, atol=1e-3)
    assert (np.asarray(u) > 0).all()


def test_quartic_roots_satisfy_equation():
    rng = np.random.default_rng(2)
    p = jnp.asarray((rng.random(1000) * 4 - 2).astype(np.float32))
    q = -0.5
    u = quartic.solution_quartic_equation(p, jnp.float64(q))
    resid = np.asarray(u ** 4 + p * u + q)
    # the fallback branches are approximations; the regular branch is exact
    assert np.median(np.abs(resid)) < 1e-9
    assert np.abs(resid).max() < 0.75


def test_quartic_initialise_potential():
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.random((8, 8, 8)).astype(np.float32) + 0.5)
    q = -2000.0
    u = quartic.initialise_potential(b, q)
    n = 8
    h2 = 1.0 / n ** 2
    uu = np.asarray(u, dtype=np.float64)
    resid = uu ** 4 + h2 * np.asarray(b, dtype=np.float64) * uu + h2 * q
    np.testing.assert_allclose(resid, 0, atol=1e-3)
    assert (np.asarray(u) > 0).all()


def _manufactured_problem(module, n=16, q=-2000.0, seed=4):
    """Build b so that a known positive u* solves operator(u*, b, q) = 0."""
    rng = np.random.default_rng(seed)
    u_star = (1.0 + 0.05 * rng.standard_normal((n, n, n))).astype(np.float32)
    u_star = jnp.asarray(u_star)
    # operator: u^3 + (h^2 b - S/6) u + q h^2 = 0 with S the neighbour sum
    # => b = [ (S/6) u - u^(k+1) - q h^2 ] / (h^2 u)
    h2 = 1.0 / n ** 2
    if module is cubic:
        S = cubic._neighbour_sq_sum(u_star)
        power = u_star ** 3
    else:
        S = quartic._neighbour_cube_sum(u_star)
        power = u_star ** 4
    b = ((S / 6.0) * u_star - power - q * h2) / (h2 * u_star)
    return u_star, b.astype(jnp.float32)


def test_cubic_gauss_seidel_converges():
    u_star, b = _manufactured_problem(cubic)
    q = -2000.0
    u = cubic.initialise_potential(b, q)
    u = cubic.smoothing(u, b, q, 100)
    err = float(cubic.residual_error(u, b, q))
    err0 = float(cubic.residual_error(cubic.initialise_potential(b, q), b, q))
    assert err < 0.05 * err0


def test_initialise_potential_finite_for_tiny_densities():
    """Near-empty cells (b -> 0) must not blow up the first guess: the
    naive Cardano branch cancels catastrophically at 4 d0^3/d1^2 < eps
    (it gave inf -> NaN FAS tolerances -> silent 30-cycle solves)."""
    n = 16  # initialise_potential derives h from b.shape[0]
    h2 = 1.0 / n ** 2
    q = -3.14e-5  # typical scalaron background
    b = jnp.asarray(
        np.geomspace(1e-12, 1e-2, 4096).astype(np.float32)
    ).reshape(n, n, n)
    for module, power in ((cubic, 3), (quartic, 4)):
        u = np.asarray(module.initialise_potential(b, q), dtype=np.float64)
        assert np.isfinite(u).all(), module.__name__
        assert (u > 0).all(), module.__name__
        # each guess approximately solves its cell equation (within the
        # documented fallback tolerance for the quartic's guarded branch)
        bb = np.asarray(b, np.float64)
        resid = u ** power + (h2 * bb) * u + h2 * q
        scale = np.abs(h2 * q)
        assert np.median(np.abs(resid) / scale) < 1e-6, module.__name__


def test_newton_smoothing_matches_exact_cubic():
    """The f32 Newton-polish sweep must track the f64 closed-form sweep."""
    u_star, b = _manufactured_problem(cubic)
    q = -2000.0
    u0 = cubic.initialise_potential(b, q)
    u_exact = cubic.smoothing(u0, b, q, 20, exact_root=True)
    u_newton = cubic.smoothing(u0, b, q, 20, exact_root=False)
    np.testing.assert_allclose(
        np.array(u_newton), np.array(u_exact), atol=2e-5, rtol=2e-5
    )


def test_newton_smoothing_matches_exact_quartic():
    u_star, b = _manufactured_problem(quartic, n=16, seed=5)
    q = -2000.0
    u0 = quartic.initialise_potential(b, q)
    u_exact = quartic.smoothing(u0, b, q, 20, exact_root=True)
    u_newton = quartic.smoothing(u0, b, q, 20, exact_root=False)
    np.testing.assert_allclose(
        np.array(u_newton), np.array(u_exact), atol=2e-5, rtol=2e-5
    )


def test_fas_cubic_newton_converges():
    """FAS with the Newton smoother reaches the manufactured solution."""
    u_star, b = _manufactured_problem(cubic, n=16)
    q = -2000.0
    ops = multigrid.fas_ops_cubic(jnp.float32(q), exact_root=False)
    u = cubic.initialise_potential(b, q)
    tol = jnp.float32(1e-3) * ops.truncation_error(u, b)
    u = multigrid.FAS(u, b, ops, 4, 2, 1, tol)
    np.testing.assert_allclose(np.array(u), np.array(u_star), atol=5e-3)


def test_fas_cubic_converges():
    u_star, b = _manufactured_problem(cubic, n=16)
    q = -2000.0
    ops = multigrid.fas_ops_cubic(jnp.float32(q))
    u = cubic.initialise_potential(b, q)
    tol = jnp.float32(1e-3) * ops.truncation_error(u, b)
    u = multigrid.FAS(u, b, ops, 4, 2, 1, tol)
    np.testing.assert_allclose(np.array(u), np.array(u_star), atol=5e-3)


def test_fas_quartic_converges():
    u_star, b = _manufactured_problem(quartic, n=16, seed=5)
    q = -2000.0
    ops = multigrid.fas_ops_quartic(jnp.float32(q))
    u = quartic.initialise_potential(b, q)
    tol = jnp.float32(1e-3) * ops.truncation_error(u, b)
    u = multigrid.FAS(u, b, ops, 4, 2, 1, tol)
    np.testing.assert_allclose(np.array(u), np.array(u_star), atol=5e-3)
