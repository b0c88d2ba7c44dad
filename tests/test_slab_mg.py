"""Slab-sharded multigrid: the distributed V-cycles must reproduce the
single-device solves (same global red-black ordering, psum'd norms)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pysco_tpu.models import cubic, laplacian, multigrid
from pysco_tpu.parallel import slab, slab_mg

M = 32
NDEV = 8
NCOARSE = 5


def _mesh():
    return slab.make_mesh(NDEV)


def _rhs(seed=0):
    rng = np.random.default_rng(seed)
    b = rng.standard_normal((M, M, M)).astype(np.float32)
    return jnp.asarray(b - b.mean())


def test_slab_gauss_seidel_matches_single():
    b = _rhs()
    x0 = laplacian.initialise_potential(b)
    mesh = _mesh()

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=(P("dp"), P("dp")),
                         out_specs=P("dp"), check_vma=False)
    def sweep(x, bl):
        return slab_mg.smoothing_slab(x, bl, 3, NDEV)

    got = np.array(sweep(x0, b))
    want = np.array(laplacian.smoothing(x0, b, 3))
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


def test_slab_linear_multigrid_matches_single():
    b = _rhs(1)
    x0 = laplacian.initialise_potential(b)
    tol = jnp.float32(1e-2) * laplacian.truncation_error(x0)
    mesh = _mesh()

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=(P("dp"), P("dp"), P()),
                         out_specs=P("dp"), check_vma=False)
    def solve(x, bl, t):
        return slab_mg.linear_slab(x, bl, NCOARSE, 2, 1, t, NDEV)

    got = np.array(solve(x0, b, tol))
    want = np.array(multigrid.linear(x0, b, NCOARSE, 2, 1, tol))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)
    # it actually solves: residual below tolerance-ish
    r = float(laplacian.residual_error(jnp.asarray(got), b))
    r0 = float(laplacian.residual_error(x0, b))
    assert r < 0.1 * r0


def test_slab_fas_cubic_matches_single():
    rng = np.random.default_rng(2)
    u_star = jnp.asarray(
        (1.0 + 0.05 * rng.standard_normal((M, M, M))).astype(np.float32)
    )
    q = -2000.0
    h2 = 1.0 / M ** 2
    S = cubic._neighbour_sq_sum(u_star)
    b = (((S / 6.0) * u_star - u_star ** 3 - q * h2) / (h2 * u_star)).astype(
        jnp.float32
    )
    u0 = cubic.initialise_potential(b, q)
    ops_single = multigrid.fas_ops_cubic(jnp.float32(q))
    tol = jnp.float32(1e-3) * ops_single.truncation_error(u0, b)
    want = np.array(multigrid.FAS(u0, b, ops_single, NCOARSE, 2, 1, tol))

    mesh = _mesh()

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=(P("dp"), P("dp"), P()),
                         out_specs=P("dp"), check_vma=False)
    def solve(u, bl, t):
        ops = slab_mg.fas_ops_cubic_slab(jnp.float32(q), NDEV)
        return slab_mg.FAS_slab(u, bl, ops, NCOARSE, 2, 1, t, NDEV)

    got = np.array(solve(u0, b, tol))
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(got, np.array(u_star), atol=5e-3)
