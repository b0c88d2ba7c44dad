"""Multigrid solver tests: convergence and agreement with the exact
discrete (7-point) spectral solve."""

import numpy as np
import jax.numpy as jnp

from pysco_tpu.models import laplacian, multigrid
from pysco_tpu.ops import fourier


def _rhs(n, seed=0):
    rng = np.random.default_rng(seed)
    b = rng.random((n, n, n)).astype(np.float32)
    b -= b.mean()
    return jnp.asarray(b)


def _exact_solution(b):
    return fourier.irfft3(fourier.inverse_laplacian_7pt(fourier.rfft3(b)))


def test_gauss_seidel_reduces_residual():
    b = _rhs(16)
    x = laplacian.initialise_potential(b)
    err0 = float(laplacian.residual_error(x, b))
    x = laplacian.smoothing(x, b, 10)
    err1 = float(laplacian.residual_error(x, b))
    assert err1 < 0.5 * err0


def test_v_cycle_converges_to_discrete_solution():
    ncoarse = 4
    b = _rhs(2 ** ncoarse, seed=1)
    exact = np.array(_exact_solution(b))
    x = laplacian.initialise_potential(b)
    for _ in range(20):
        x = multigrid.V_cycle(x, b, ncoarse, 2, 1)
    got = np.array(x)
    got -= got.mean()
    exact -= exact.mean()
    assert np.abs(got - exact).max() < 5e-4 * np.abs(exact).max() + 1e-5


def test_linear_driver_reaches_tolerance():
    ncoarse = 5
    b = _rhs(2 ** ncoarse, seed=2)
    x = laplacian.initialise_potential(b)
    tol = jnp.float32(1e-2) * laplacian.truncation_error(x)
    x = multigrid.linear(x, b, ncoarse, 2, 1, tol)
    # converged well below the initial error
    x0 = laplacian.initialise_potential(b)
    assert float(laplacian.residual_error(x, b)) < 0.05 * float(
        laplacian.residual_error(x0, b)
    )


def test_f_and_w_cycles_converge():
    ncoarse = 4
    b = _rhs(2 ** ncoarse, seed=3)
    exact = np.array(_exact_solution(b))
    exact -= exact.mean()
    for cycle in (multigrid.F_cycle, multigrid.W_cycle):
        x = laplacian.initialise_potential(b)
        for _ in range(10):
            x = cycle(x, b, ncoarse, 2, 1)
        got = np.array(x)
        got -= got.mean()
        assert np.abs(got - exact).max() < 1e-3 * np.abs(exact).max() + 1e-5


def test_fas_laplacian_matches_linear():
    """FAS on the (linear) reformulated Laplacian solves the same problem."""
    ncoarse = 4
    b = _rhs(2 ** ncoarse, seed=4)
    exact = np.array(_exact_solution(b))
    exact -= exact.mean()
    ops = multigrid.fas_ops_laplacian()
    x = laplacian.initialise_potential(b)
    for _ in range(20):
        x = multigrid.V_cycle_FAS(x, b, ops, ncoarse, 2, 1)
    got = np.array(x)
    got -= got.mean()
    assert np.abs(got - exact).max() < 1e-3 * np.abs(exact).max() + 1e-5


def test_f_cycle_fas_matches_linear():
    """F-cycle FAS (reference multigrid.py:642-719) solves the linear
    reformulated problem to the same answer, and is selectable from FAS()."""
    ncoarse = 4
    b = _rhs(2 ** ncoarse, seed=6)
    exact = np.array(_exact_solution(b))
    exact -= exact.mean()
    ops = multigrid.fas_ops_laplacian()
    x = laplacian.initialise_potential(b)
    for _ in range(12):
        x = multigrid.F_cycle_FAS(x, b, ops, ncoarse, 2, 1)
    got = np.array(x)
    got -= got.mean()
    assert np.abs(got - exact).max() < 1e-3 * np.abs(exact).max() + 1e-5
    # driver dispatch accepts cycle="F"
    x2 = laplacian.initialise_potential(b)
    tol = jnp.float32(1e-2) * ops.truncation_error(x2, b)
    x2 = multigrid.FAS(x2, b, ops, ncoarse, 2, 1, tol, cycle="F")
    assert float(ops.residual_error(x2, b)) <= float(
        ops.residual_error(laplacian.initialise_potential(b), b)
    )


def test_reformulated_consistency():
    """operator_reformulated = -(h^2/6) * (laplacian - b-term) algebra check."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((8, 8, 8)).astype(np.float32))
    b = jnp.asarray(rng.random((8, 8, 8)).astype(np.float32))
    n = 8
    ref = laplacian.operator_reformulated(x, b)
    # x + (h^2 b - sum_nb)/6 == -(h^2/6)(L(x) - b)
    expect = -(1.0 / (6 * n * n)) * (
        np.asarray(laplacian.operator(x)) - np.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(ref), expect, atol=1e-5)


def test_cycle_types_through_solver_config():
    """F and W cycles are selectable via the multigrid_cycle key and solve
    to the same answer as V (reference multigrid.py:583-858)."""
    import numpy as np
    import jax.numpy as jnp

    from pysco_tpu import solver as solver_mod

    n = 16
    npart = n ** 3
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.random((npart, 3), dtype=np.float32))
    accs = {}
    for cycle in ("V", "F", "W"):
        param = {
            "theory": "newton", "ncoarse": 4, "npart": npart,
            "mass_scheme": "tsc", "linear_newton_solver": "multigrid",
            "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
            "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
            "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-4,
            "multigrid_cycle": cycle,
        }
        cfg = solver_mod.config_from_param(param)
        assert cfg.multigrid_cycle == cycle
        dyn = solver_mod.compute_dynamics(param)
        phi0, u0 = solver_mod.empty_fields(cfg)
        _, _, acc, _, _, _, _ = solver_mod.pm(
            cfg, True, False, pos, None, phi0, u0, dyn
        )
        (accs[cycle],) = solver_mod.particles_to_rows(cfg, acc)
    scale = np.abs(accs["V"]).max()
    for cycle in ("F", "W"):
        np.testing.assert_allclose(
            accs[cycle], accs["V"], atol=1e-4 * scale, err_msg=cycle
        )
