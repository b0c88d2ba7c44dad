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


# ---------------------------------------------------------------------------
# Packed half-lattice slab smoothers vs the masked reference sweeps
# (bit-exact: same update order, same float summation order)
# ---------------------------------------------------------------------------


def _pos_grid(seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (np.abs(rng.standard_normal((M, M, M))) + 0.5).astype(np.float32)
    )


def test_slab_pack_separates_global_parity():
    i, j, k = np.meshgrid(*[np.arange(M)] * 3, indexing="ij")
    parity = ((i + j + k) & 1).astype(np.float32)  # 1 on red cells
    mesh = _mesh()

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=(P("dp"),),
                         out_specs=(P("dp"), P("dp"), P("dp")),
                         check_vma=False)
    def packed(x):
        red, black = slab_mg.pack_rb_slab(x)
        return red, black, slab_mg.unpack_rb_slab(red, black)

    x = jnp.asarray(parity)
    red, black, roundtrip = packed(x)
    assert np.all(np.array(red) == 1.0)
    assert np.all(np.array(black) == 0.0)
    assert np.array_equal(np.array(roundtrip), np.array(x))


@pytest.mark.parametrize("with_rhs", [False, True])
def test_slab_packed_linear_smoothing_bitwise(with_rhs):
    b = _rhs(10)
    x0 = laplacian.initialise_potential(b)
    rhs = _rhs(11) if with_rhs else None
    mesh = _mesh()
    in_specs = (P("dp"),) * (3 if with_rhs else 2)

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=(P("dp"), P("dp")), check_vma=False)
    def both(x, bl, *r):
        r = r[0] if r else None
        packed = slab_mg.smoothing_slab(x, bl, 3, NDEV, rhs=r)
        masked = x
        for _ in range(3):
            masked = slab_mg.gauss_seidel_slab(masked, bl, NDEV, rhs=r)
        return packed, masked

    args = (x0, b) + ((rhs,) if with_rhs else ())
    packed, masked = both(*args)
    assert np.array_equal(np.array(packed), np.array(masked))


def _scalaron_problem(n_power, q, seed):
    """(u0, b) with b constructed so a known positive u_star solves the
    scalaron equation u^(n+1) + p u + q h^2 = 0 and u0 is a small
    perturbation of it -- the regime the smoother actually runs in
    (Newton contracting at every cell). Random unrelated (u, b) pairs
    put cells near f'(u) ~ 0 where the Newton polish amplifies 1-ulp
    FMA-contraction differences chaotically."""
    rng = np.random.default_rng(seed)
    u_star = jnp.asarray(
        (1.0 + 0.05 * rng.standard_normal((M, M, M))).astype(np.float32)
    )
    h2 = 1.0 / M ** 2
    if n_power == 2:
        S = cubic._neighbour_sq_sum(u_star)
        b = ((S / 6.0) * u_star - u_star ** 3 - q * h2) / (h2 * u_star)
    else:
        up = u_star * u_star * u_star
        S = (jnp.roll(up, 1, 0) + jnp.roll(up, -1, 0)
             + jnp.roll(up, 1, 1) + jnp.roll(up, -1, 1)
             + jnp.roll(up, 1, 2) + jnp.roll(up, -1, 2))
        b = ((S / 6.0) * u_star - u_star ** 4 - q * h2) / (h2 * u_star)
    u0 = u_star * jnp.asarray(
        (1.0 + 0.01 * rng.standard_normal((M, M, M))).astype(np.float32)
    )
    return u0, b.astype(jnp.float32)


@pytest.mark.parametrize("n_power", [2, 3])
@pytest.mark.parametrize("exact_root", [False, True])
@pytest.mark.parametrize("with_rhs", [False, True])
def test_slab_packed_scalaron_smoothing_bitwise(n_power, exact_root,
                                                with_rhs):
    q = -2000.0
    u0, b = _scalaron_problem(n_power, q, 20 + n_power)
    rhs = 1e-5 * _rhs(22) if with_rhs else None
    mesh = _mesh()
    in_specs = (P("dp"),) * (3 if with_rhs else 2)
    make_ops = (slab_mg.fas_ops_cubic_slab if n_power == 2
                else slab_mg.fas_ops_quartic_slab)

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=(P("dp"), P("dp")), check_vma=False)
    def both(u, bl, *r):
        r = r[0] if r else None
        ops = make_ops(jnp.float32(q), NDEV, exact_root=exact_root)
        packed = ops.smoothing(u, bl, 3, r)
        masked = u
        for _ in range(3):
            masked = ops.gauss_seidel_masked(masked, bl, r)
        return packed, masked

    args = (u0, b) + ((rhs,) if with_rhs else ())
    packed, masked = both(*args)
    packed, masked = np.array(packed), np.array(masked)
    # same update order and summation order; the only permitted
    # difference is compiler FMA-contraction noise (~1 ulp on the f32
    # p term), which the well-conditioned Newton/Cardano roots do not
    # amplify
    np.testing.assert_allclose(packed, masked, atol=2e-5)
