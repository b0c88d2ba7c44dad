"""PM force accuracy against an independent float64 NumPy oracle.

This is the core correctness anchor (SURVEY.md section 4): the full
deposit -> Poisson solve -> gradient -> gather pipeline must match a
straightforward double-precision re-implementation of the same maths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu import solver as solver_mod


def _oracle_newton_fft(pos, n, aexp, om_m, order=5, scheme="cic"):
    """float64 CIC/TSC deposit + compensated FFT Poisson + stencil + gather."""
    npart = pos.shape[0]

    def axis_weights(c):
        xp = c * n
        i = int(xp)
        d = xp - 0.5 - i
        if scheme == "cic":
            s = int(np.sign(d))
            return [(i, 1 - abs(d)), ((i + s) % n, abs(d))]
        return [
            ((i - 1) % n, 0.5 * (0.5 - d) ** 2),
            (i, 0.75 - d * d),
            ((i + 1) % n, 0.5 * (0.5 + d) ** 2),
        ]

    grid = np.zeros((n, n, n))
    per_particle = []
    for p in pos.astype(np.float64):
        axes = [axis_weights(c) for c in p]
        cells = []
        for i, wi in axes[0]:
            for j, wj in axes[1]:
                for k, wk in axes[2]:
                    w = wi * wj * wk
                    grid[i, j, k] += w
                    cells.append(((i, j, k), w))
        per_particle.append(cells)
    grid *= n ** 3 / npart

    rhs = 1.5 * aexp * om_m * (grid - 1)
    rhs_k = np.fft.rfftn(rhs)
    kf = ((np.arange(n) + n // 2) % n - n // 2).astype(np.float64)
    kx = kf[:, None, None]
    ky = kf[None, :, None]
    kz = np.arange(n // 2 + 1, dtype=np.float64)[None, None, :]
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    k2[0, 0, 0] = 1.0
    h = 1.0 / n
    w = np.sinc(kx * h) * np.sinc(ky * h) * np.sinc(kz * h)
    p_comp = {"cic": 2, "tsc": 3}[scheme]
    phi_k = rhs_k * (w ** (-2 * p_comp)) * (-0.25 / np.pi ** 2) / k2
    phi_k[0, 0, 0] = 0
    phi = np.fft.irfftn(phi_k, s=(n, n, n), axes=(0, 1, 2))

    # 5-point stencil gradient
    force = np.empty((n, n, n, 3))
    for ax in range(3):
        force[..., ax] = (n / 12.0) * (
            8 * (np.roll(phi, -1, ax) - np.roll(phi, 1, ax))
            + np.roll(phi, 2, ax)
            - np.roll(phi, -2, ax)
        )

    acc = np.zeros((npart, 3))
    for ip, cells in enumerate(per_particle):
        for (i, j, k), w in cells:
            acc[ip] += w * force[i, j, k]
    return acc


@pytest.mark.parametrize("scheme", ["cic", "tsc"])
def test_pm_newton_fft_matches_float64_oracle(scheme):
    n = 16
    npart = 512
    rng = np.random.default_rng(0)
    pos = rng.random((npart, 3), dtype=np.float32)
    aexp, om_m = 0.1, 0.3

    param = {
        "theory": "newton", "ncoarse": 4, "npart": npart,
        "mass_scheme": scheme, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": aexp, "Om_m": om_m, "epsrel": 1e-2,
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    pos_out, _, acc, _, _, _, overflow = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), None, phi0, u0, dyn
    )
    assert int(overflow) == 0
    pos_out, acc = solver_mod.particles_to_rows(cfg, pos_out, acc)

    # the sorted engines permute particles; evaluate the oracle at the
    # returned positions
    want = _oracle_newton_fft(pos_out, n, aexp, om_m, scheme=scheme)
    scale = np.abs(want).max()
    np.testing.assert_allclose(acc, want, atol=2e-4 * scale)


def test_pm_multigrid_matches_fft7pt():
    """The multigrid solve and the exact discrete 7pt spectral solve must
    give nearly identical forces (same discrete operator)."""
    n = 16
    npart = n ** 3
    rng = np.random.default_rng(1)
    pos = rng.random((npart, 3), dtype=np.float32)
    base = {
        "theory": "newton", "ncoarse": 4, "npart": npart,
        "mass_scheme": "tsc", "gradient_stencil_order": 5,
        "Npre": 2, "Npost": 1, "fR_n": 1, "mond_function": "simple",
        "mond_alpha": 1.0, "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-4,
    }
    accs = {}
    for solver_name in ("multigrid", "fft_7pt"):
        param = dict(base, linear_newton_solver=solver_name)
        cfg = solver_mod.config_from_param(param)
        dyn = solver_mod.compute_dynamics(param)
        phi0, u0 = solver_mod.empty_fields(cfg)
        _, _, acc, _, _, _, _ = solver_mod.pm(
            cfg, True, False, jnp.asarray(pos), None, phi0, u0, dyn
        )
        (acc,) = solver_mod.particles_to_rows(cfg, acc)
        accs[solver_name] = acc
    scale = np.abs(accs["fft_7pt"]).max()
    np.testing.assert_allclose(
        accs["multigrid"], accs["fft_7pt"], atol=2e-3 * scale
    )
