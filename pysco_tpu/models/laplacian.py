"""Linear 7-point Laplacian operators and red-black Gauss-Seidel smoothing.

Replaces the reference's ``laplacian.py`` / ``laplacian_reformulated.py``
Numba kernels. Grid units: the mesh spacing is h = 1/N so the operator is
``(sum of 6 neighbours - 6x) * N^2``. The "reformulated" fixed-point form
``x + (h^2 b - sum_neighbours)/6`` is what FAS cycles operate on
(reference: laplacian_reformulated.py:21, multigrid.py:195-208).

Red-black Gauss-Seidel (f_relax = 1.25, Kravtsov 1997;
laplacian.py:844-1055) is implemented as two masked checkerboard
half-updates: cells with odd (i+j+k) parity ("red") are relaxed first using
only even-parity neighbours, then vice versa -- the same update order and
values as the reference's loop kernels, without atomics or loop coloring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import mesh

F32 = jnp.float32
F_RELAX = 1.25  # Kravtsov et al. 1997


def neighbour_sum(x: jax.Array) -> jax.Array:
    return (
        mesh.roll(x, 1, 0)
        + mesh.roll(x, -1, 0)
        + mesh.roll(x, 1, 1)
        + mesh.roll(x, -1, 1)
        + mesh.roll(x, 1, 2)
        + mesh.roll(x, -1, 2)
    )


def operator(x: jax.Array) -> jax.Array:
    """7-point Laplacian: (sum_nb - 6 x) / h^2."""
    n = x.shape[0]
    invh2 = F32(n * n)
    return (neighbour_sum(x) - F32(6) * x) * invh2


def operator_reformulated(x: jax.Array, b: jax.Array) -> jax.Array:
    """Fixed-point form: x + (h^2 b - sum_nb) / 6."""
    n = x.shape[0]
    h2 = F32(1.0 / (n * n))
    return x + F32(1.0 / 6.0) * (h2 * b - neighbour_sum(x))


def residual(x: jax.Array, b: jax.Array) -> jax.Array:
    """residual = b - Laplacian(x)."""
    return b - operator(x)


def residual_error(x: jax.Array, b: jax.Array) -> jax.Array:
    """sqrt(sum((b - Lx)^2)) -- linear multigrid convergence metric."""
    r = residual(x, b)
    return jnp.sqrt(jnp.sum(r * r))


def residual_error_reformulated(x: jax.Array, b: jax.Array) -> jax.Array:
    r = operator_reformulated(x, b)
    return jnp.sqrt(jnp.sum(r * r))


def restrict_residual(x: jax.Array, b: jax.Array) -> jax.Array:
    """Restriction of (b - Lx) to the coarse grid."""
    return mesh.restriction(residual(x, b))


def truncation_error(x: jax.Array) -> jax.Array:
    """||restriction(L x) - L(restriction(x))||_2 (Numerical Recipes)."""
    t = mesh.restriction(operator(x)) - operator(mesh.restriction(x))
    return jnp.sqrt(jnp.sum(t * t))


def truncation_error_reformulated(x: jax.Array, b: jax.Array) -> jax.Array:
    """FAS variant with the x4 coarse-grid correction
    (laplacian_reformulated.py:201-258)."""
    RLx = mesh.restriction(operator_reformulated(x, b))
    LRx = operator_reformulated(mesh.restriction(x), mesh.restriction(b))
    t = F32(4) * RLx - LRx
    return jnp.sqrt(jnp.sum(t * t))


def initialise_potential(b: jax.Array) -> jax.Array:
    """One Jacobi sweep from zero: u = -h^2 b / 6."""
    n = b.shape[0]
    return F32(-1.0 / (6.0 * n * n)) * b


def red_black_masks(n: int):
    """Checkerboard parity masks. red = odd (i+j+k), black = even."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 2)
    parity = (ii + jj + kk) & 1
    red = parity == 1
    return red, ~red


def _parity(n: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 2)
    return (ii + jj + kk) & 1


def gauss_seidel(x: jax.Array, b: jax.Array, f_relax: float = F_RELAX) -> jax.Array:
    """One red-black over-relaxed Gauss-Seidel sweep.

    The two colour half-updates run as a 2-iteration fori_loop (red = odd
    parity first) so the stencil body appears only once in the HLO --
    compile time matters on this toolchain.
    """
    n = x.shape[0]
    h2b = F32(1.0 / (n * n)) * b
    invsix = F32(1.0 / 6.0)
    fr = F32(f_relax)
    parity = _parity(n)

    def half(i, x):
        mask = parity == (1 - i)
        x_target = (neighbour_sum(x) - h2b) * invsix
        return jnp.where(mask, x + fr * (x_target - x), x)

    if jax.default_backend() == "tpu":
        # rolled: the big stencil body appears once in the HLO
        return jax.lax.fori_loop(0, 2, half, x)
    return half(1, half(0, x))


def gauss_seidel_with_rhs(
    x: jax.Array, b: jax.Array, rhs: jax.Array, f_relax: float = F_RELAX
) -> jax.Array:
    """Red-black sweep for the reformulated equation with FAS rhs:
    x = (sum_nb - h^2 b)/6 + rhs."""
    n = x.shape[0]
    h2b = F32(1.0 / (n * n)) * b
    invsix = F32(1.0 / 6.0)
    fr = F32(f_relax)
    parity = _parity(n)

    def half(i, x):
        mask = parity == (1 - i)
        x_target = (neighbour_sum(x) - h2b) * invsix + rhs
        return jnp.where(mask, x + fr * (x_target - x), x)

    if jax.default_backend() == "tpu":
        # rolled: the big stencil body appears once in the HLO
        return jax.lax.fori_loop(0, 2, half, x)
    return half(1, half(0, x))


def smoothing(x: jax.Array, b: jax.Array, n_smoothing: int) -> jax.Array:
    if jax.default_backend() == "tpu":
        return jax.lax.fori_loop(
            0, n_smoothing, lambda _, xc: gauss_seidel(xc, b), x
        )
    for _ in range(n_smoothing):
        x = gauss_seidel(x, b)
    return x


def smoothing_with_rhs(
    x: jax.Array, b: jax.Array, n_smoothing: int, rhs: jax.Array
) -> jax.Array:
    if jax.default_backend() == "tpu":
        return jax.lax.fori_loop(
            0, n_smoothing,
            lambda _, xc: gauss_seidel_with_rhs(xc, b, rhs), x,
        )
    for _ in range(n_smoothing):
        x = gauss_seidel_with_rhs(x, b, rhs)
    return x
