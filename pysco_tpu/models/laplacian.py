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
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        return jnp.sqrt(ps.residual_norm2("linear", x, b))
    r = residual(x, b)
    return jnp.sqrt(jnp.sum(r * r))


def residual_error_reformulated(x: jax.Array, b: jax.Array) -> jax.Array:
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        return jnp.sqrt(ps.residual_norm2("reformulated", x, b))
    r = operator_reformulated(x, b)
    return jnp.sqrt(jnp.sum(r * r))


def restrict_residual(x: jax.Array, b: jax.Array) -> jax.Array:
    """Restriction of (b - Lx) to the coarse grid."""
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        return ps.restrict3("linear", x, b)[0]
    return mesh.restriction(residual(x, b))


def truncation_error(x: jax.Array) -> jax.Array:
    """||restriction(L x) - L(restriction(x))||_2 (Numerical Recipes)."""
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        RLx, Rx = ps.restrict3("laplacian", x)
        t = RLx - operator(Rx)
    else:
        t = mesh.restriction(operator(x)) - operator(mesh.restriction(x))
    return jnp.sqrt(jnp.sum(t * t))


def truncation_error_reformulated(x: jax.Array, b: jax.Array) -> jax.Array:
    """FAS variant with the x4 coarse-grid correction
    (laplacian_reformulated.py:201-258)."""
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        RLx, x_c, b_c = ps.restrict3("reformulated", x, b)
    else:
        RLx = mesh.restriction(operator_reformulated(x, b))
        x_c, b_c = mesh.restriction(x), mesh.restriction(b)
    t = F32(4) * RLx - operator_reformulated(x_c, b_c)
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


# ---------------------------------------------------------------------------
# Packed red-black half-lattices
#
# The masked checkerboard sweep computes the full neighbour stencil for
# every cell and discards half of it with a where -- 2x the necessary
# bandwidth and compute per colour half (the reference's loop kernels,
# laplacian.py:844-1055, touch each cell once). Packing the two colours
# into separate (n, n/2, n) half-lattices makes every load and every
# flop useful: the red update reads only black (its 6 neighbours are all
# black) and vice versa. Packing is along y (the sublane axis) so the
# lane axis keeps the full grid extent -- no TPU lane padding waste at
# any multigrid level. The update order and float summation order are
# bit-identical to the masked sweep (tests/test_packed_rb.py).
#
# Packed layout: s(i,k) = (i+k) & 1;
#   red[i, jp, k]   = x[i, 2*jp + 1 - s, k]   (odd total parity)
#   black[i, jp, k] = x[i, 2*jp + s, k]       (even total parity)
# ---------------------------------------------------------------------------


def _parity_ik(n: int):
    """s(i,k) = (i+k) & 1 as a bool (n, 1, n) mask (True where s == 1)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, 1, n), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (n, 1, n), 2)
    return ((ii + kk) & 1) == 1


def pack_rb(x: jax.Array):
    """Split a (n, n, n) grid into (red, black) (n, n/2, n) half-lattices."""
    n = x.shape[0]
    x5 = x.reshape(n, n // 2, 2, n)
    s1 = _parity_ik(n)
    even, odd = x5[:, :, 0, :], x5[:, :, 1, :]
    red = jnp.where(s1, even, odd)
    black = jnp.where(s1, odd, even)
    return red, black


def unpack_rb(red: jax.Array, black: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_rb`."""
    n = red.shape[0]
    s1 = _parity_ik(n)
    even = jnp.where(s1, red, black)
    odd = jnp.where(s1, black, red)
    return jnp.stack((even, odd), axis=2).reshape(n, n, n)


def packed_neighbour_sum(src: jax.Array, to_red: bool) -> jax.Array:
    """Sum of the 6 stencil neighbours of each `to_red` (else black) cell,
    read from the opposite-colour half-lattice ``src``.

    x and z neighbours live at the same packed y index; the two y
    neighbours are ``src`` itself and one y-roll, which of the two is
    j-1 vs j+1 depends on s(i,k). The additions run in the exact order
    of :func:`neighbour_sum` (x-, x+, y-, y+, z-, z+) so results are
    bit-identical to the masked sweep.
    """
    n = src.shape[0]
    s1 = _parity_ik(n)
    if to_red:
        ym = jnp.where(s1, mesh.roll(src, 1, 1), src)
        yp = jnp.where(s1, src, mesh.roll(src, -1, 1))
    else:
        ym = jnp.where(s1, src, mesh.roll(src, 1, 1))
        yp = jnp.where(s1, mesh.roll(src, -1, 1), src)
    return (
        mesh.roll(src, 1, 0)
        + mesh.roll(src, -1, 0)
        + ym
        + yp
        + mesh.roll(src, 1, 2)
        + mesh.roll(src, -1, 2)
    )


def _run_sweeps(sweep, red, black, n_smoothing: int):
    """fori_loop on TPU (one stencil body in the HLO: compile time),
    unrolled elsewhere (interpret-mode CPU is faster unrolled)."""
    if jax.default_backend() == "tpu":
        return jax.lax.fori_loop(0, n_smoothing, sweep, (red, black))
    for _ in range(n_smoothing):
        red, black = sweep(0, (red, black))
    return red, black


def _use_pallas_sweeps(n: int, injected: bool) -> bool:
    """Plane-pipelined Pallas sweeps (ops/pallas_stencil.py) for large
    grids on the TPU backend: identical operation order (agreement to
    float32 roundoff) at ~1/5 the HBM traffic of the XLA roll chain. Coarse multigrid levels and the
    slab-sharded smoothers (which inject their own packing/halo
    primitives) stay on the XLA path."""
    from ..ops import pallas_stencil as ps

    return (
        not injected
        and n >= ps.PALLAS_MIN_N
        and jax.default_backend() == "tpu"
    )


def _smoothing_packed_pallas(x, b, n_smoothing: int, rhs=None,
                             f_relax: float = F_RELAX):
    """Pallas fast path of :func:`_smoothing_packed` (same operation
    order; agreement to f32 roundoff, tests/test_pallas_stencil.py)."""
    from ..ops import pallas_stencil as ps

    n = x.shape[1]
    red, black = pack_rb(x)
    h2b_r, h2b_b = pack_rb(F32(1.0 / (n * n)) * b)
    rhs_r, rhs_b = pack_rb(rhs) if rhs is not None else (None, None)

    def sweep(_, carry):
        red, black = carry
        red = ps.half_sweep(black, red, h2b_r, True, f_relax, rhs_r)
        black = ps.half_sweep(red, black, h2b_b, False, f_relax, rhs_b)
        return red, black

    red, black = _run_sweeps(sweep, red, black, n_smoothing)
    return unpack_rb(red, black)


def _smoothing_packed(x, b, n_smoothing: int, rhs=None,
                      f_relax: float = F_RELAX,
                      pack=None, unpack=None, neighbour_sum=None):
    """n_smoothing red-black sweeps with a single pack/unpack round trip.

    The packing/neighbour primitives are injectable so the slab-sharded
    smoother (parallel/slab_mg.smoothing_slab: global-parity packing,
    x-neighbours via a 1-plane halo exchange) shares this driver instead
    of duplicating it."""
    if _use_pallas_sweeps(x.shape[1], pack is not None):
        return _smoothing_packed_pallas(x, b, n_smoothing, rhs, f_relax)
    pack = pack or pack_rb
    unpack = unpack or unpack_rb
    neighbour_sum = neighbour_sum or packed_neighbour_sum
    n = x.shape[1]
    fr = F32(f_relax)
    invsix = F32(1.0 / 6.0)
    red, black = pack(x)
    h2b_r, h2b_b = pack(F32(1.0 / (n * n)) * b)
    rhs_r, rhs_b = pack(rhs) if rhs is not None else (None, None)

    def sweep(_, carry):
        red, black = carry
        tgt = (neighbour_sum(black, True) - h2b_r) * invsix
        if rhs_r is not None:
            tgt = tgt + rhs_r
        red = red + fr * (tgt - red)
        tgt = (neighbour_sum(red, False) - h2b_b) * invsix
        if rhs_b is not None:
            tgt = tgt + rhs_b
        black = black + fr * (tgt - black)
        return red, black

    red, black = _run_sweeps(sweep, red, black, n_smoothing)
    return unpack(red, black)


def packed_scalaron_smoothing(x, b, q, n_smoothing: int, rhs,
                              exact_root: bool, n_power: int,
                              newton_root, exact_solve,
                              exact_scale: float,
                              pack=None, unpack=None,
                              neighbour_sum=None) -> jax.Array:
    """Shared packed red-black sweep driver for the f(R) scalaron
    (u^(n_power+1) + p u + q h^2 = 0): each colour update reads only the
    opposite half-lattice's n_power-th power and solves the root only
    for the cells it updates. The cubic (n_power=2) and quartic
    (n_power=3) smoothers differ only in the neighbour power, the
    closed-form solver and how rhs enters the exact coefficient
    (d1 = 27 h^2 q - 27 rhs vs q_eff = h^2 q - rhs: ``exact_scale``),
    so both delegate here (cubic.smoothing / quartic.smoothing); the
    slab-sharded scalaron smoother injects its packing/halo primitives
    (parallel/slab_mg._fas_ops_scalaron_slab) instead of duplicating
    the driver."""
    import jax.numpy as jnp

    pack = pack or pack_rb
    unpack = unpack or unpack_rb
    neighbour_sum = neighbour_sum or packed_neighbour_sum
    F64 = jnp.float64
    n = x.shape[1]
    h2 = 1.0 / (n * n)
    fr = F32(F_RELAX)
    invsix = F32(1.0 / 6.0)
    red, black = pack(x)
    hb_r, hb_b = pack(F32(h2) * b)
    if exact_root:
        base = exact_scale * h2 * jnp.asarray(q, F64)
        if rhs is None:
            coef_r = coef_b = base
        else:
            r_r, r_b = pack(rhs)
            coef_r = base - exact_scale * r_r.astype(F64)
            coef_b = base - exact_scale * r_b.astype(F64)
    else:
        c0_q = F32(h2) * jnp.asarray(q, F32)
        if rhs is None:
            coef_r = coef_b = c0_q
        else:
            r_r, r_b = pack(rhs)
            coef_r, coef_b = c0_q - r_r, c0_q - r_b

    if not exact_root and _use_pallas_sweeps(n, pack is not pack_rb):
        from ..ops import pallas_stencil as ps

        def sweep(_, carry):
            red, black = carry
            red = ps.scalaron_half_sweep(
                black, red, hb_r, coef_r, True, F_RELAX, n_power
            )
            black = ps.scalaron_half_sweep(
                red, black, hb_b, coef_b, False, F_RELAX, n_power
            )
            return red, black

        red, black = _run_sweeps(sweep, red, black, n_smoothing)
        return unpack(red, black)

    def update(x_half, other, hb, coef, to_red):
        xp = other * other if n_power == 2 else other * other * other
        p = hb - invsix * neighbour_sum(xp, to_red)
        if exact_root:
            x_new = exact_solve(p, coef).astype(F32)
        else:
            x_new = newton_root(x_half, p, coef)
        return x_half + fr * (x_new - x_half)

    def sweep(_, carry):
        red, black = carry
        red = update(red, black, hb_r, coef_r, True)
        black = update(black, red, hb_b, coef_b, False)
        return red, black

    red, black = _run_sweeps(sweep, red, black, n_smoothing)
    return unpack(red, black)


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
    return _smoothing_packed(x, b, n_smoothing)


def smoothing_with_rhs(
    x: jax.Array, b: jax.Array, n_smoothing: int, rhs: jax.Array
) -> jax.Array:
    return _smoothing_packed(x, b, n_smoothing, rhs)
