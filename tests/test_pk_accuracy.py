"""Power-spectrum fidelity: the fast engines must reproduce the scatter
reference P(k) to well under the 0.1% target after a multi-step run."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu import integrate, solver as solver_mod
from pysco_tpu.ops import fourier, mesh


def _run_engine(engine, nsteps=8):
    n = 16
    npart = n ** 3
    rng = np.random.default_rng(0)
    # quasi-uniform lattice + perturbation: a realistic displaced field
    grid = (np.indices((n, n, n)).reshape(3, -1).T + 0.5) / n
    pos = (grid + 0.002 * rng.standard_normal((npart, 3))).astype(np.float32) % 1
    vel = (0.05 * rng.standard_normal((npart, 3))).astype(np.float32)

    param = {
        "theory": "newton", "ncoarse": 4, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": engine,
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    pos_j, vel_j, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    state = (pos_j, vel_j, acc, phi, u)
    dt = np.float32(2e-3)
    for _ in range(nsteps):
        out = integrate.step(cfg, "leapfrog", False, False, *state, dyn, dt)
        state = out[:5]
    (pos_f,) = solver_mod.particles_to_rows(cfg, state[0])
    # density P(k) of the final particle distribution (scatter deposit so
    # the measurement itself is engine-independent)
    dens = mesh.deposit(jnp.asarray(pos_f), n, "tsc")
    k, pk, nm = fourier.power_spectrum(fourier.rfft3(dens), 3)
    return np.array(k), np.array(pk)


@pytest.mark.parametrize("engine", ["dense", "pallas"])
def test_pk_matches_scatter_reference(engine):
    k0, pk0 = _run_engine("scatter")
    k1, pk1 = _run_engine(engine)
    np.testing.assert_allclose(k1, k0, rtol=1e-6)
    rel = np.abs(pk1 - pk0) / pk0
    assert rel.max() < 1e-3, f"max P(k) deviation {rel.max():.2e}"
