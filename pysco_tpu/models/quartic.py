"""f(R) n=2 scalaron operator: per-cell depressed quartic solves.

For Hu-Sawicki n=2 the reduced scalaron obeys ``u^4 + p u + q = 0`` per cell
(Ruan et al. 2021; reference ``quartic.py``). The root is found through the
resolvent cubic in float64 with the same fallbacks to ``(-q)^(1/4)`` as the
reference (quartic.py:157-204), vectorized and branchless.

Conventions (h = 1/N):
- operator(x, b, q)[ijk] = x^4 + p x + q h^2,
  p = h^2 b - (1/6) sum_nb x_nb^3
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import mesh
from .laplacian import F_RELAX, _parity

F32 = jnp.float32
F64 = jnp.float64


def solution_quartic_equation(p: jax.Array, q: jax.Array) -> jax.Array:
    """Real positive root of u^4 + p u + q = 0 (float64, branchless)."""
    pp = p.astype(F64)
    qq = jnp.broadcast_to(jnp.asarray(q, F64), pp.shape)

    fallback = jnp.abs(qq) ** 0.25  # (-q)^(1/4) for q < 0; |q| guards q >= 0

    d0 = 12.0 * qq
    d1_safe = jnp.where(pp == 0.0, 1.0, 27.0 * pp * pp)
    sqrt_term = 1.0 - 4.0 * d0 * (d0 / d1_safe) ** 2
    sqrt_term_safe = jnp.where(sqrt_term < 0.0, 0.0, sqrt_term)
    Q = jnp.cbrt(0.5 * d1_safe * (1.0 + jnp.sqrt(sqrt_term_safe)))
    Q_safe = jnp.where(Q == 0.0, 1.0, Q)
    Q_d0oQ = Q_safe + d0 / Q_safe
    S = 0.5 * jnp.sqrt(jnp.where(Q_d0oQ > 0.0, Q_d0oQ, 1.0) / 3.0)
    S_safe = jnp.where(S == 0.0, 1.0, S)
    disc_pos = -4.0 * S * S + pp / S_safe
    disc_neg = -4.0 * S * S - pp / S_safe
    root_p_pos = -S + 0.5 * jnp.sqrt(jnp.maximum(disc_pos, 0.0))
    root_p_neg = S + 0.5 * jnp.sqrt(jnp.maximum(disc_neg, 0.0))
    root = jnp.where(pp > 0.0, root_p_pos, root_p_neg)
    root = jnp.where(Q_d0oQ > 0.0, root, fallback)
    root = jnp.where(sqrt_term < 0.0, fallback, root)
    return jnp.where(pp == 0.0, fallback, root)


def initialise_potential(b: jax.Array, q) -> jax.Array:
    """First guess assuming u_nb = 0 (quartic.py:214-268).

    Guarded against the small-b cancellation in ``Q + d0/Q`` (near-empty
    cells): any non-finite/non-positive result falls back to the b = 0
    root (-h^2 q)^(1/4).
    """
    n = b.shape[0]
    h2 = 1.0 / (n * n)
    d0 = 12.0 * h2 * jnp.asarray(q, F64)
    p = h2 * b.astype(F64)
    d1 = 27.0 * p * p
    Q = jnp.cbrt(0.5 * (d1 + jnp.sqrt(d1 * d1 - 4.0 * d0 ** 3)))
    S = 0.5 * jnp.sqrt(jnp.abs(Q + d0 / Q) / 3.0)
    S = jnp.where(S > 0.0, S, 1.0)
    u = -S + 0.5 * jnp.sqrt(jnp.maximum(-4.0 * S * S + p / S, 0.0))
    fallback = jnp.abs(h2 * jnp.asarray(q, F64)) ** 0.25
    good = jnp.isfinite(u) & (u > 0.25 * fallback)
    return jnp.where(good, u, fallback).astype(F32)


def _neighbour_cube_sum(x: jax.Array) -> jax.Array:
    x3 = x * x * x
    return (
        mesh.roll(x3, 1, 0)
        + mesh.roll(x3, -1, 0)
        + mesh.roll(x3, 1, 1)
        + mesh.roll(x3, -1, 1)
        + mesh.roll(x3, 1, 2)
        + mesh.roll(x3, -1, 2)
    )


def _p_term(x: jax.Array, b: jax.Array) -> jax.Array:
    n = x.shape[0]
    h2 = F32(1.0 / (n * n))
    return h2 * b - F32(1.0 / 6.0) * _neighbour_cube_sum(x)


def operator(x: jax.Array, b: jax.Array, q) -> jax.Array:
    n = x.shape[0]
    qh2 = F32(q) * F32(1.0 / (n * n))
    p = _p_term(x, b)
    x2 = x * x
    return x2 * x2 + p * x + qh2


def residual_with_rhs(x: jax.Array, b: jax.Array, q, rhs: jax.Array) -> jax.Array:
    return rhs - operator(x, b, q)


def residual_error(x: jax.Array, b: jax.Array, q) -> jax.Array:
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        return jnp.sqrt(ps.residual_norm2("quartic", x, b, q=q))
    r = operator(x, b, q)
    return jnp.sqrt(jnp.sum(r * r))


def restrict_residual(x: jax.Array, b: jax.Array, q) -> jax.Array:
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        return -ps.restrict3("quartic", x, b, q=q)[0]
    return mesh.minus_restriction(operator(x, b, q))


def restrict_residual_with_rhs(
    x: jax.Array, b: jax.Array, q, rhs: jax.Array
) -> jax.Array:
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        return ps.restrict3("quartic", x, b, rhs=rhs, q=q)[0]
    return mesh.restriction(residual_with_rhs(x, b, q, rhs))


def truncation_error(x: jax.Array, b: jax.Array, q) -> jax.Array:
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        RLx, x_c, b_c = ps.restrict3("quartic", x, b, q=q)
    else:
        RLx = mesh.restriction(operator(x, b, q))
        x_c, b_c = mesh.restriction(x), mesh.restriction(b)
    t = F32(4) * RLx - operator(x_c, b_c, q)
    return jnp.sqrt(jnp.sum(t * t))


def _newton_root(x: jax.Array, p: jax.Array, c0, iters: int = 3) -> jax.Array:
    """Polish the root of u^4 + p u + c0 = 0 by float32 Newton from seed x
    (same rationale as cubic._newton_root: the grid value is the previous
    sweep's root, so a few steps reach float32 roundoff)."""
    for _ in range(iters):
        x2 = x * x
        f = x2 * x2 + p * x + c0
        fp = F32(4) * x2 * x + p
        fp = jnp.where(jnp.abs(fp) < F32(1e-12), F32(1e-12), fp)
        x = x - f / fp
    return x


def gauss_seidel(
    x: jax.Array, b: jax.Array, q, rhs=None, f_relax: float = F_RELAX,
    exact_root: bool = False,
) -> jax.Array:
    """One red-black sweep of the nonlinear quartic Gauss-Seidel.

    The cell equation with FAS rhs is u^4 + p u + (q h^2 - rhs) = 0.
    ``exact_root=True`` uses the float64 resolvent-cubic closed form (the
    reference's method, quartic.py:157-204); the default Newton polish
    matches it to float32 roundoff at a fraction of the cost.
    """
    n = x.shape[0]
    h2 = 1.0 / (n * n)
    fr = F32(f_relax)
    parity = _parity(n)
    if exact_root:
        q_eff_base = h2 * jnp.asarray(q, F64)
        q_eff = q_eff_base if rhs is None else q_eff_base - rhs.astype(F64)
    else:
        c0_q = F32(h2) * jnp.asarray(q, F32)
        c0 = c0_q if rhs is None else c0_q - rhs

    def half(i, x):
        mask = parity == (1 - i)
        p = _p_term(x, b)
        if exact_root:
            x_new = solution_quartic_equation(p, q_eff).astype(F32)
        else:
            x_new = _newton_root(x, p, c0)
        return jnp.where(mask, x + fr * (x_new - x), x)

    if jax.default_backend() == "tpu":
        # rolled: the big stencil body appears once in the HLO
        return jax.lax.fori_loop(0, 2, half, x)
    return half(1, half(0, x))


def smoothing(x: jax.Array, b: jax.Array, q, n_smoothing: int, rhs=None,
              exact_root: bool = False) -> jax.Array:
    """n_smoothing red-black sweeps on packed half-lattices (one
    pack/unpack round trip; see laplacian.pack_rb and cubic.smoothing --
    same structure with cube-sum neighbours and the quartic root)."""
    from .laplacian import packed_scalaron_smoothing

    return packed_scalaron_smoothing(
        x, b, q, n_smoothing, rhs, exact_root, n_power=3,
        newton_root=_newton_root, exact_solve=solution_quartic_equation,
        exact_scale=1.0,
    )
