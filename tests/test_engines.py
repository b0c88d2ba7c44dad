"""All three particle engines must produce the same PM forces."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu import solver as solver_mod


@pytest.mark.parametrize("scheme", ["cic", "tsc"])
def test_engines_agree(scheme):
    n = 16
    npart = 2048
    rng = np.random.default_rng(0)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.01 * rng.standard_normal((npart, 3))).astype(np.float32)

    results = {}
    for engine in ("scatter", "dense", "pallas"):
        param = {
            "theory": "newton", "ncoarse": 4, "npart": npart,
            "mass_scheme": scheme, "linear_newton_solver": "fft",
            "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
            "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
            "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
            "particle_engine": engine,
        }
        cfg = solver_mod.config_from_param(param)
        dyn = solver_mod.compute_dynamics(param)
        phi0, u0 = solver_mod.empty_fields(cfg)
        p, v, acc, phi, u, _, overflow = solver_mod.pm(
            cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
        )
        assert int(overflow) == 0
        # canonical ordering for cross-engine comparison
        p, v, acc = solver_mod.particles_to_rows(cfg, p, v, acc)
        order = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
        results[engine] = (p[order], acc[order], np.array(phi))

    p0, a0, phi0 = results["scatter"]
    for engine in ("dense", "pallas"):
        p1, a1, phi1 = results[engine]
        np.testing.assert_allclose(p1, p0, atol=0)
        scale = np.abs(a0).max()
        np.testing.assert_allclose(a1, a0, atol=2e-4 * scale, err_msg=engine)
        np.testing.assert_allclose(
            phi1, phi0, atol=1e-4 * np.abs(phi0).max(), err_msg=engine
        )


def test_chunk_size_env_equivalence(tmp_path):
    """PYSCO_TPU_CHUNK (the per-chunk DMA/MXU quantum of the pallas
    engine, bound at import time) must not change physics: compute the
    same force evaluation at Q=1024 in a subprocess and compare with the
    in-process default-Q result. The chunk walk never changes which
    particles contribute, only how the per-chunk partial sums group, so
    agreement is to float32 summation-order noise."""
    import os
    import subprocess
    import sys

    n = 16
    npart = 2048
    rng = np.random.default_rng(5)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.01 * rng.standard_normal((npart, 3))).astype(np.float32)
    np.save(tmp_path / "pos.npy", pos)
    np.save(tmp_path / "vel.npy", vel)

    script = f"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from pysco_tpu import solver as solver_mod
from pysco_tpu.ops import pallas_pm
assert pallas_pm.Q == 1024, pallas_pm.Q
pos = np.load(r"{tmp_path}/pos.npy")
vel = np.load(r"{tmp_path}/vel.npy")
param = {{
    "theory": "newton", "ncoarse": 4, "npart": {npart},
    "mass_scheme": "tsc", "linear_newton_solver": "fft",
    "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
    "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
    "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
    "particle_engine": "pallas",
}}
cfg = solver_mod.config_from_param(param)
dyn = solver_mod.compute_dynamics(param)
phi0, u0 = solver_mod.empty_fields(cfg)
p, v, acc, phi, u, _, overflow = solver_mod.pm(
    cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
)
assert int(overflow) == 0
p, v, acc = solver_mod.particles_to_rows(cfg, p, v, acc)
order = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
np.save(r"{tmp_path}/acc_1024.npy", acc[order])
np.save(r"{tmp_path}/p_1024.npy", p[order])
"""
    env = dict(os.environ, PYSCO_TPU_CHUNK="1024")
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    param = {
        "theory": "newton", "ncoarse": 4, "npart": npart,
        "mass_scheme": "tsc", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.3, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    phi0, u0 = solver_mod.empty_fields(cfg)
    p, v, acc, phi, u, _, overflow = solver_mod.pm(
        cfg, True, False, jnp.asarray(pos), jnp.asarray(vel), phi0, u0, dyn
    )
    assert int(overflow) == 0
    p, v, acc = solver_mod.particles_to_rows(cfg, p, v, acc)
    order = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    np.testing.assert_array_equal(np.load(tmp_path / "p_1024.npy"), p[order])
    scale = np.abs(acc).max()
    np.testing.assert_allclose(np.load(tmp_path / "acc_1024.npy"),
                               acc[order], atol=1e-5 * scale)
