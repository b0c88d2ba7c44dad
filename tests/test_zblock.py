"""z-blocked tile windows (PYSCO_TPU_ZB) vs the scatter reference.

At large grids (m >= 512) the engine bins tiles along z too, shrinking
the kernel windows' lane extent (pallas_pm._zb_size). CI grids are far
below that threshold, so the multi-z-block code path (block-local z
one-hot, z halo in gather, z fold in deposit, z term in
drift_violations) is exercised here by forcing a tiny ZB through the
environment in a subprocess (the constant is baked at import time).
"""

import json
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import json
import os
import jax

# the container's sitecustomize forces the axon backend regardless of
# JAX_PLATFORMS; switch back before any device use (mirrors conftest)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from pysco_tpu.ops import mesh, pallas_pm

m = int(os.environ["ZBLOCK_TEST_M"])
schemes = os.environ["ZBLOCK_TEST_SCHEMES"].split(",")
assert pallas_pm.n_zblocks(m) == m // 8  # the env override took effect

out = {}
rng = np.random.default_rng(0)
n = 3000
for scheme in schemes:
    for drift in (0, 2):
        pos_r = rng.random((n, 3)).astype(np.float32)
        vel_r = rng.standard_normal((n, 3)).astype(np.float32)
        pos, vel = pallas_pm.to_columns(pos_r, vel_r, n)
        ps, vs, ts = pallas_pm.sort_particles(pos, vel, m, scheme)
        assert ts.shape[0] == pallas_pm.n_tiles(m) + 1
        if drift:
            # emulate a stale sort: drift every particle < `drift` cells
            delta = ((drift - 0.05) / m) * rng.uniform(
                -1.0, 1.0, (3, ps.shape[1])
            ).astype(np.float32)
            arr = np.array(ps)
            real = arr[0] < pallas_pm.SENTINEL_MIN
            arr[:3] = np.where(real, (arr[:3] + delta) % 1.0, arr[:3])
            ps = jnp.asarray(arr)
        key = f"{scheme}_d{drift}"
        out[key + "_viol"] = int(
            pallas_pm.drift_violations(ps, ts, m, scheme, drift)
        )
        rows = np.array(ps)[:3].T
        rows = jnp.asarray(rows[np.array(ps[0]) < pallas_pm.SENTINEL_MIN])
        grid = pallas_pm.deposit(ps, ts, m, scheme, True, drift)
        oracle = mesh.deposit(rows, m, scheme)
        out[key + "_dep"] = float(
            jnp.max(jnp.abs(grid - oracle))
        )
        f = rng.standard_normal((3, m, m, m)).astype(np.float32)
        got = pallas_pm.gather_vec_cl(
            jnp.asarray(f), ps, ts, scheme, True, drift
        )
        ref = mesh.gather_vec(
            jnp.asarray(np.moveaxis(f, 0, -1)), rows, scheme
        )
        out[key + "_gat"] = float(
            jnp.max(jnp.abs(got[:3, : rows.shape[0]] - ref.T))
        )
print("@@" + json.dumps(out))
"""


# m=16 (nby=2): strictly serial deposit order; m=32 (nby=4): the
# pipelined read-ahead/write-behind phase order is active, with 4
# z-blocks exercising the z-phase stride too
@pytest.mark.parametrize("m,schemes", [(16, "ngp,cic,tsc"), (32, "cic")])
def test_zblocked_engine_matches_scatter(m, schemes):
    env = dict(os.environ)
    env.update({"PYSCO_TPU_ZB": "8", "JAX_PLATFORMS": "cpu",
                "ZBLOCK_TEST_M": str(m), "ZBLOCK_TEST_SCHEMES": schemes})
    r = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("@@")][-1]
    out = json.loads(line[2:])
    for key, val in out.items():
        if key.endswith("_viol"):
            assert val == 0, (key, val)
        else:
            assert val < 2e-4, (key, val)
