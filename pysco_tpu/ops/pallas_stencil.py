"""Plane-pipelined Pallas sweeps for the packed red-black half-lattices.

The XLA packed smoother (models/laplacian._smoothing_packed) is
algebraically minimal -- every load and flop is useful -- but the six
neighbour rolls of the opposite half-lattice are materialised by XLA as
separate HBM round trips: one measured half-sweep at 256^3 moves ~8x the
strictly necessary bytes (3.1 ms vs a ~0.4 ms bandwidth bound on v5e).

These kernels stream the half-lattices through VMEM in blocks of B
x-planes.  In the packed layout (models/laplacian.py: red[i, jp, k]
pairs with black x-neighbours at planes i-1 / i+1 AT THE SAME packed
(jp, k) index) a colour update for planes [i0, i0+B) needs the opposite
colour's planes [i0-1, i0+B] -- the centre block plus ONE extra plane on
each side, fetched as two single-plane views with periodic
((i0 +- 1) mod n) BlockSpec index maps; the y/z neighbours are
sublane/lane rolls inside the block.  Per half-sweep the kernel moves
(1 + 2/B) reads of the source colour plus one read each of the target
and h2b (and optional FAS rhs) and one write -- ~4.3 plane-grids of HBM
traffic at B=8 instead of the XLA path's ~20.

Numerics are OPERATION-ORDER IDENTICAL to the XLA packed sweep (and
therefore to the reference's masked checkerboard semantics,
laplacian.py:844-1022): the neighbour additions run in the same order
(x-, x+, y-, y+, z-, z+), the update uses the same expression, and the
scalaron variant squares/cubes the neighbour planes elementwise before
summing exactly like the XLA path. Results agree to float32 roundoff --
the only divergence is fused-multiply-add contraction, which XLA and
Mosaic may apply to different sub-expressions
(tests/test_pallas_stencil.py; on the TPU backend the two paths measure
bit-identical).

The smoothers in models/laplacian.py dispatch here for grids with
n >= PALLAS_MIN_N on the TPU backend (coarse multigrid levels stay on
the XLA path: they are latency- not bandwidth-bound, and their lane
extents are below the 128-lane tile).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

F32 = jnp.float32
NF32 = np.float32  # numpy scalars: capturable by kernels as constants

# Minimum unpacked grid extent for the Pallas sweep path. Below this the
# plane lane extent (< 128) wastes tiles and the XLA path is fine.
PALLAS_MIN_N = int(os.environ.get("PYSCO_TPU_PALLAS_SMOOTH_MIN_N", "128"))

# Pipeline VMEM budget for choosing the plane-block depth B (bytes).
# ~16 MB/core total; leave headroom for Mosaic's own buffers.
_VMEM_BUDGET = 10 * 2 ** 20


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _block_depth(n: int, plane_bytes: int, n_plane_ops: int) -> int:
    """Largest B in {8,4,2,1} dividing n whose double-buffered working
    set (2 halo planes + n_plane_ops B-plane operands incl. output)
    fits the VMEM budget."""
    for b in (8, 4, 2, 1):
        if n % b == 0 and (2 + b * n_plane_ops) * plane_bytes * 2 <= _VMEM_BUDGET:
            return b
    return 1


def _neighbour_blocks(prev1, cen, nxt1, i0, to_red: bool):
    """The six packed-lattice neighbour blocks of the opposite colour for
    output planes [i0, i0+B), in the summation order of
    laplacian.packed_neighbour_sum: x-, x+, y-, y+, z-, z+.

    ``prev1``/``nxt1`` are the single halo planes (1, hp, nl); ``cen``
    the (B, hp, nl) centre block. The parity s(i, k) alternates per
    plane, so it is a (B, 1, nl) mask built from the global plane index
    ``i0``.
    """
    b, hp, nl = cen.shape
    ext = jnp.concatenate([prev1, cen, nxt1], axis=0)  # (B+2, hp, nl)
    xm = ext[: b, :, :]
    xp = ext[2 : b + 2, :, :]
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1, nl), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (b, 1, nl), 2)
    s1 = ((i0 + ii + kk) & 1) == 1
    ym_roll = jnp.roll(cen, 1, axis=1)
    yp_roll = jnp.roll(cen, -1, axis=1)
    if to_red:
        ym = jnp.where(s1, ym_roll, cen)
        yp = jnp.where(s1, cen, yp_roll)
    else:
        ym = jnp.where(s1, cen, ym_roll)
        yp = jnp.where(s1, yp_roll, cen)
    zm = jnp.roll(cen, 1, axis=2)
    zp = jnp.roll(cen, -1, axis=2)
    return xm, xp, ym, yp, zm, zp


def _call(kernel, src, extras):
    """pallas_call over blocks of B x-planes: the source colour arrives
    as a B-plane centre block plus two periodic single-plane halo views
    (the Pallas pipeline double-buffers all fetches); plane-shaped
    extras and the output ride the centre block; a (1, 1) extra is a
    scalar parameter in SMEM.

    The kernel receives (prev1, cen, nxt1, *extras, out) refs plus the
    global plane index of cen[0] via pl.program_id(0) * B.
    """
    from jax.experimental.pallas import tpu as pltpu

    n, hp, nl = src.shape
    n_plane_extras = sum(1 for a in extras if a.ndim == 3)
    # plane ops per step: centre + plane extras + output
    B = _block_depth(n, hp * nl * 4, 2 + n_plane_extras)
    block = (B, hp, nl)

    # Index maps must return PURE int32 under jax_enable_x64 (which the
    # library turns on for host-side cosmology): the program id is i32
    # while literal ints trace to i64, and Mosaic neither legalizes a
    # mixed (i32, i64, i64) index tuple nor supports i64 at all.
    Z = np.int32(0)

    def to32(i):
        return i.astype(jnp.int32) if hasattr(i, "astype") else np.int32(i)

    centre = lambda i: (to32(i), Z, Z)  # noqa: E731

    def halo(d):
        # single-plane periodic halo: plane (i*B + d) mod n, as a block
        # index of a (1, hp, nl) block. No Python % on tracers --
        # jnp.mod's sign fixup emits converts Mosaic chokes on.
        def f(i):
            return (
                jax.lax.rem(to32(i) * np.int32(B) + np.int32(n + d),
                            np.int32(n)),
                Z, Z,
            )

        return f

    def extra_spec(a):
        if a.ndim == 3:
            return pl.BlockSpec(block, centre)
        return pl.BlockSpec(
            (1, 1), lambda i: (Z, Z), memory_space=pltpu.SMEM
        )

    in_specs = [
        pl.BlockSpec((1, hp, nl), halo(-1)),
        pl.BlockSpec(block, centre),
        pl.BlockSpec((1, hp, nl), halo(B)),
    ] + [extra_spec(a) for a in extras]
    out_spec = pl.BlockSpec(block, centre)

    def wrapped(prev_ref, cen_ref, nxt_ref, *rest):
        i0 = pl.program_id(0) * np.int32(B)
        kernel(i0, prev_ref, cen_ref, nxt_ref, *rest)

    return pl.pallas_call(
        wrapped,
        grid=(n // B,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, hp, nl), F32),
        interpret=_interpret(),
    )(src, src, src, *extras)


# ---------------------------------------------------------------------------
# Linear (Laplacian) half-sweep
# ---------------------------------------------------------------------------

def half_sweep(src, dst, h2b, to_red: bool, f_relax: float, rhs=None):
    """One colour half of a packed red-black Gauss-Seidel sweep:
    dst += f_relax * ((sum_nb(src) - h2b)/6 [+ rhs] - dst)."""
    fr = NF32(f_relax)
    invsix = NF32(1.0 / 6.0)
    has_rhs = rhs is not None

    def kernel(i0, prev_ref, cen_ref, nxt_ref, dst_ref, h2b_ref, *rest):
        rhs_ref, out_ref = (rest[0], rest[1]) if has_rhs else (None, rest[0])
        xm, xp, ym, yp, zm, zp = _neighbour_blocks(
            prev_ref[...], cen_ref[...], nxt_ref[...], i0, to_red
        )
        nbsum = xm + xp + ym + yp + zm + zp
        tgt = (nbsum - h2b_ref[...]) * invsix
        if has_rhs:
            tgt = tgt + rhs_ref[...]
        old = dst_ref[...]
        out_ref[...] = old + fr * (tgt - old)

    extras = (dst, h2b, rhs) if has_rhs else (dst, h2b)
    return _call(kernel, src, extras)


# ---------------------------------------------------------------------------
# Scalaron (f(R) cubic/quartic) half-sweep: Newton-polished root of
# u^(n_power+1) + p u + c0 = 0 per cell (models/cubic._newton_root)
# ---------------------------------------------------------------------------

def scalaron_half_sweep(src, dst, hb, coef, to_red: bool, f_relax: float,
                        n_power: int, newton_iters: int = 3):
    """One colour half of the packed nonlinear scalaron sweep.

    ``src`` is the opposite colour half-lattice (its n_power-th power
    enters the neighbour sum), ``hb`` = h^2 * b packed half, ``coef`` the
    constant cubic/quartic term (h^2 q [- rhs], already folded by the
    caller -- models/laplacian.packed_scalaron_smoothing).
    """
    fr = NF32(f_relax)
    invsix = NF32(1.0 / 6.0)
    coef = jnp.asarray(coef, F32)
    coef_is_plane = coef.ndim == 3
    eps = NF32(1e-12)

    def newton(x, p, c0):
        # expression-for-expression the same as cubic._newton_root /
        # quartic._newton_root (agreement to f32 roundoff; FMA
        # contraction is the only divergence)
        for _ in range(newton_iters):
            if n_power == 2:
                f = x * (x * x + p) + c0
                fp = NF32(3) * x * x + p
            else:
                x2 = x * x
                f = x2 * x2 + p * x + c0
                fp = NF32(4) * x2 * x + p
            fp = jnp.where(jnp.abs(fp) < eps, eps, fp)
            x = x - f / fp
        return x

    def kernel(i0, prev_ref, cen_ref, nxt_ref, dst_ref, hb_ref, coef_ref,
               out_ref):
        if n_power == 2:
            pw = lambda a: a * a  # noqa: E731
        else:
            pw = lambda a: a * a * a  # noqa: E731
        xm, xp, ym, yp, zm, zp = _neighbour_blocks(
            pw(prev_ref[...]), pw(cen_ref[...]), pw(nxt_ref[...]), i0, to_red
        )
        nbsum = xm + xp + ym + yp + zm + zp
        p = hb_ref[...] - invsix * nbsum
        c0 = coef_ref[...] if coef_is_plane else coef_ref[0, 0]
        old = dst_ref[...]
        x_new = newton(old, p, c0)
        out_ref[...] = old + fr * (x_new - old)

    if not coef_is_plane:
        coef = coef.reshape(1, 1)
    return _call(kernel, src, (dst, hb, coef))


# ===========================================================================
# Full-lattice plane-pipelined kernels: the remaining multigrid bandwidth
# hogs (residual norms, restriction of residuals, trilinear prolongation).
#
# Same streaming structure as the half-lattice sweeps above: blocks of
# x-planes ride the Pallas pipeline with two periodic single-plane halo
# views; y/z neighbours are sublane/lane rolls inside the block. The
# 2x2x2 restriction and the 2x-per-axis trilinear prolongation are done
# as exact-weight matmuls on the MXU (pair-sum / expansion matrices built
# from iotas) -- stride-2 indexing on the lane axis does not lower well
# on Mosaic, a (n, n/2) one-hot contraction does. On-chip profile
# motivating this (tools/mg_profile.py, 256^3): residual_error 4.29 ms,
# truncation_error 4.51 ms, V_cycle 12.64 ms -- all ~4x above their HBM
# bound because XLA materialises every roll.
#
# Numerics: neighbour additions run in the reference order (x-, x+, y-,
# y+, z-, z+; laplacian.neighbour_sum, cubic._neighbour_sq_sum); the
# restriction pair sums and prolongation weights go through the MXU at
# HIGHEST precision (bf16x6 passes), so results agree with the XLA path
# to float32 roundoff rather than bit-exactly. Reductions (norm2) sum
# per-plane-block partials, which reassociates the grid sum -- the norms
# feed tolerance comparisons, not the solution.
# ===========================================================================

#: residual kinds -> (neighbour power, needs b)
_KINDS = {
    "linear": (1, True),        # b - Laplacian(x)        (laplacian.residual)
    "laplacian": (1, False),    # Laplacian(x)            (truncation_error)
    "reformulated": (1, True),  # x + (h^2 b - S)/6       (operator_reformulated)
    "cubic": (2, True),         # x^3 + p x + q h^2       (cubic.operator)
    "quartic": (3, True),       # x^4 + p x + q h^2       (quartic.operator)
}


def use_pallas_full(n: int) -> bool:
    """Gate for the full-lattice kernels: large grids on the TPU backend.
    Callers in models/ are only reached with replicated (non-sharded)
    arrays -- the slab path has its own halo-aware operators."""
    return n >= PALLAS_MIN_N and jax.default_backend() == "tpu"


def _pow(x, power: int):
    if power == 1:
        return x
    if power == 2:
        return x * x
    return x * x * x


def _full_neighbour_sum(prev1, cen, nxt1, power: int):
    """Neighbour sum of x^power over the full lattice for the centre
    block, in the reference order x-, x+, y-, y+, z-, z+. ``prev1`` /
    ``nxt1`` are single periodic halo planes."""
    b = cen.shape[0]
    ext = jnp.concatenate([_pow(prev1, power), _pow(cen, power),
                           _pow(nxt1, power)], axis=0)
    cp = ext[1:b + 1]
    return (
        ext[:b]
        + ext[2:b + 2]
        + jnp.roll(cp, 1, axis=1)
        + jnp.roll(cp, -1, axis=1)
        + jnp.roll(cp, 1, axis=2)
        + jnp.roll(cp, -1, axis=2)
    )


def _residual_block(kind: str, n: int, x, S, b, q, rhs):
    """The per-cell residual expression of ``kind`` on one plane block
    (same expressions as models/laplacian.py, cubic.py, quartic.py).
    ``S`` is the neighbour sum of x^power; ``rhs`` (optional) flips the
    expression to rhs - op."""
    h2 = NF32(1.0 / (n * n))
    if kind == "linear":
        r = b - (S - NF32(6.0) * x) * NF32(float(n) * float(n))
    elif kind == "laplacian":
        r = (S - NF32(6.0) * x) * NF32(float(n) * float(n))
    elif kind == "reformulated":
        r = x + NF32(1.0 / 6.0) * (h2 * b - S)
    else:
        p = h2 * b - NF32(1.0 / 6.0) * S
        if kind == "cubic":
            r = x * x * x + p * x + q * h2
        else:
            x2 = x * x
            r = x2 * x2 + p * x + q * h2
    if rhs is not None:
        r = rhs - r
    return r


def _hipdot(a, b):
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=F32)


def _pair_mats(rows: int, lanes: int):
    """Exact 0/1 pair-sum matrices for the 2x2x2 restriction:
    PyT (rows/2, rows) sums sublane pairs from the left, Pz
    (lanes, lanes/2) sums lane pairs from the right."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes // 2), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes // 2), 1)
    Pz = ((i0 >> 1) == i1).astype(F32)
    j0 = jax.lax.broadcasted_iota(jnp.int32, (rows // 2, rows), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (rows // 2, rows), 1)
    PyT = ((j1 >> 1) == j0).astype(F32)
    return PyT, Pz


def _restrict_block(r):
    """(2*CB, rows, lanes) fine block -> (CB, rows/2, lanes/2)
    full-weighting restriction (mean over 2x2x2 children,
    mesh.restriction)."""
    cb2, rows, lanes = r.shape
    PyT, Pz = _pair_mats(rows, lanes)
    planes = []
    for j in range(cb2 // 2):
        pa = _hipdot(PyT, _hipdot(r[2 * j], Pz))
        pb = _hipdot(PyT, _hipdot(r[2 * j + 1], Pz))
        planes.append(NF32(0.125) * (pa + pb))
    return jnp.stack(planes, axis=0)


def _full_specs(n: int, depth: int, n_extras: int, extras):
    """BlockSpecs for a full-lattice kernel consuming ``depth`` x-planes
    of the stencil source per grid step (+ 2 periodic halo planes) and
    ``depth``-plane centre blocks of each 3D extra; (1, 1) extras ride
    SMEM. Returns (grid, in_specs)."""
    from jax.experimental.pallas import tpu as pltpu

    Z = np.int32(0)

    def to32(i):
        return i.astype(jnp.int32) if hasattr(i, "astype") else np.int32(i)

    def halo(d):
        def f(i):
            return (jax.lax.rem(to32(i) * np.int32(depth) + np.int32(n + d),
                                np.int32(n)), Z, Z)

        return f

    centre = lambda i: (to32(i), Z, Z)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, n, n), halo(-1)),
        pl.BlockSpec((depth, n, n), centre),
        pl.BlockSpec((1, n, n), halo(depth)),
    ]
    for a in extras:
        if a.ndim == 3:
            in_specs.append(pl.BlockSpec((depth, n, n), centre))
        else:
            in_specs.append(pl.BlockSpec(
                (1, 1), lambda i: (Z, Z), memory_space=pltpu.SMEM))
    return n // depth, in_specs


def _depth_for(n: int, n_plane_ops: int, choices=(8, 4, 2, 1)) -> int:
    """Largest per-step plane depth whose double-buffered working set
    (2 halo planes + n_plane_ops depth-plane operands) fits VMEM."""
    pb = n * n * 4
    for d in choices:
        if n % d == 0 and (2 + d * n_plane_ops) * pb * 2 <= _VMEM_BUDGET:
            return d
    return 1


def _gather_extras(kind: str, b, rhs, q):
    power, needs_b = _KINDS[kind]
    extras = []
    if needs_b:
        extras.append(b)
    if rhs is not None:
        extras.append(rhs)
    if kind in ("cubic", "quartic"):
        extras.append(jnp.asarray(q, F32).reshape(1, 1))
    return power, needs_b, extras


def residual_norm2(kind: str, x, b=None, rhs=None, q=None):
    """Sum of squares of the ``kind`` residual over the full lattice
    (callers take sqrt). One streaming pass; partial sums per plane
    block."""
    n = x.shape[0]
    power, needs_b, extras = _gather_extras(kind, b, rhs, q)
    n_plane = 1 + sum(1 for a in extras if a.ndim == 3)
    depth = _depth_for(n, n_plane)
    grid, in_specs = _full_specs(n, depth, len(extras), extras)

    def kernel(prev_ref, cen_ref, nxt_ref, *rest):
        refs = list(rest)
        out_ref = refs.pop()
        bb = refs.pop(0)[...] if needs_b else None
        rr = refs.pop(0)[...] if rhs is not None else None
        qq = refs.pop(0)[0, 0] if kind in ("cubic", "quartic") else None
        xc = cen_ref[...]
        S = _full_neighbour_sum(prev_ref[...], xc, nxt_ref[...], power)
        r = _residual_block(kind, n, xc, S, bb, qq, rr)
        # Mosaic needs the two minor block dims tiled (8, 128): pad the
        # per-step partial row to an (8, n) block (rows 1-7 zero).
        v = jnp.sum(r * r, axis=(0, 1)).reshape(1, n)
        pad = jnp.concatenate([v, jnp.zeros((7, n), F32)], axis=0)
        out_ref[...] = pad.reshape(1, 8, n)

    Z = np.int32(0)
    partial = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, n), lambda i: (i.astype(jnp.int32)
                                  if hasattr(i, "astype") else np.int32(i),
                                  Z, Z)),
        out_shape=jax.ShapeDtypeStruct((grid, 8, n), F32),
        interpret=_interpret(),
    )(x, x, x, *extras)
    return jnp.sum(partial)


def _yb_for(n: int, cb: int, n3d_extras: int, n_out: int):
    """Largest y-block (rows) whose double-buffered working set fits the
    VMEM budget for the y-blocked restriction kernel. None if nothing
    >= 16 rows fits (output sublane blocks need yb/2 >= 8)."""
    depth = 2 * cb
    for yb in (256, 128, 64, 32, 16):
        if yb > n or n % yb != 0:
            continue
        # full-lane-equivalent rows per step: centre + 2 x-halos +
        # 2 8-row y-halos + 3D extras + coarse outputs (half lanes)
        rows = (depth * yb + 2 * yb + 2 * depth * 8
                + n3d_extras * depth * yb + n_out * cb * yb // 4)
        if rows * n * 4 * 2 <= _VMEM_BUDGET:
            return yb
    return None


def _restrict3_yblocked(kind, x, b, rhs, q, needs_b, power, cb, yb):
    """restrict3 with the sublane (y) axis blocked as well, for fine
    grids whose full-row working set would force the coarse-block depth
    to 1 (whose Mosaic lowering crashes -- see restrict3). Blocks are
    (2*cb planes, yb rows, n lanes); the y-neighbour rolls read two
    extra 8-row views of the adjacent row-blocks; z stays full-lane, x
    rides the usual periodic plane halos."""
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    m = n // 2
    depth = 2 * cb
    extras = []
    if needs_b:
        extras.append(b)
    if rhs is not None:
        extras.append(rhs)
    if kind in ("cubic", "quartic"):
        extras.append(jnp.asarray(q, F32).reshape(1, 1))
    Z = np.int32(0)
    nyb = n // 8  # row-blocks of the minimal 8-row granule

    def to32(i):
        return i.astype(jnp.int32) if hasattr(i, "astype") else np.int32(i)

    centre = lambda i, j: (to32(i), to32(j), Z)  # noqa: E731
    centre_c = lambda i, j: (to32(i), to32(j), Z)  # noqa: E731

    def halo_x(d):
        def f(i, j):
            return (jax.lax.rem(to32(i) * np.int32(depth) + np.int32(n + d),
                                np.int32(n)), to32(j), Z)

        return f

    def halo_y(d):
        # 8-row view at row-block (j*yb/8 + d) mod (n/8), same planes
        def f(i, j):
            return (to32(i), jax.lax.rem(
                to32(j) * np.int32(yb // 8) + np.int32(nyb + d),
                np.int32(nyb)), Z)

        return f

    in_specs = [
        pl.BlockSpec((1, yb, n), halo_x(-1)),
        pl.BlockSpec((depth, yb, n), centre),
        pl.BlockSpec((1, yb, n), halo_x(depth)),
        pl.BlockSpec((depth, 8, n), halo_y(-1)),
        pl.BlockSpec((depth, 8, n), halo_y(yb // 8)),
    ]
    for a in extras:
        if a.ndim == 3:
            in_specs.append(pl.BlockSpec((depth, yb, n), centre))
        else:
            in_specs.append(pl.BlockSpec(
                (1, 1), lambda i, j: (Z, Z), memory_space=pltpu.SMEM))

    def kernel(prev_ref, cen_ref, nxt_ref, ym_ref, yp_ref, *rest):
        refs = list(rest)
        outs = [refs.pop() for _ in range(2 + int(needs_b))][::-1]
        bb = refs.pop(0)[...] if needs_b else None
        rr = refs.pop(0)[...] if rhs is not None else None
        qq = refs.pop(0)[0, 0] if kind in ("cubic", "quartic") else None
        xc = cen_ref[...]
        d = xc.shape[0]
        pw = lambda a: _pow(a, power)  # noqa: E731
        ext = jnp.concatenate([pw(prev_ref[...]), pw(xc), pw(nxt_ref[...])],
                              axis=0)
        cp = ext[1:d + 1]
        # y-rolls across the row-block boundary via the 8-row halo views
        ym = jnp.concatenate([pw(ym_ref[...][:, 7:8, :]), cp[:, :-1, :]],
                             axis=1)
        yp = jnp.concatenate([cp[:, 1:, :], pw(yp_ref[...][:, 0:1, :])],
                             axis=1)
        S = (ext[:d] + ext[2:d + 2] + ym + yp
             + jnp.roll(cp, 1, axis=2) + jnp.roll(cp, -1, axis=2))
        r = _residual_block(kind, n, xc, S, bb, qq, rr)
        outs[0][...] = _restrict_block(r)
        outs[1][...] = _restrict_block(xc)
        if needs_b:
            outs[2][...] = _restrict_block(bb)

    n_out = 2 + int(needs_b)
    return pl.pallas_call(
        kernel,
        grid=(n // depth, n // yb),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec((cb, yb // 2, m), centre_c)
                        for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((m, m, m), F32)
                        for _ in range(n_out)),
        interpret=_interpret(),
    )(x, x, x, x, x, *extras)


def _xla_restrict3(kind, x, b, rhs, q, needs_b, power):
    """XLA composition of restrict3 (self-contained: jnp rolls +
    reduce_window, same expressions/operation order as the models)."""
    from . import mesh

    n = x.shape[0]
    xp = _pow(x, power)
    S = (mesh.roll(xp, 1, 0) + mesh.roll(xp, -1, 0)
         + mesh.roll(xp, 1, 1) + mesh.roll(xp, -1, 1)
         + mesh.roll(xp, 1, 2) + mesh.roll(xp, -1, 2))
    qq = jnp.asarray(q, F32) if kind in ("cubic", "quartic") else None
    r = _residual_block(kind, n, x, S, b, qq, rhs)
    out = [mesh.restriction(r), mesh.restriction(x)]
    if needs_b:
        out.append(mesh.restriction(b))
    return tuple(out)


def restrict3(kind: str, x, b=None, rhs=None, q=None):
    """Fused restriction pass: one read of the fine lattice yields
    (restriction(r), restriction(x)[, restriction(b)]) where r is the
    ``kind`` residual (rhs - op when ``rhs`` is given). Replaces the
    XLA chain residual -> reduce_window (+ 2 more full reads for the FAS
    x_c / b_c restrictions).

    When the full-row working set only fits VMEM at a coarse-block depth
    of 1 (512^3 fine grids) -- whose Mosaic lowering crashes the TPU
    compile helper; cb>=2 at 256^3 compiles and runs -- the kernel
    blocks the sublane (y) axis as well (`_restrict3_yblocked`) to keep
    cb = 2, and composes the result in XLA only as a last resort."""
    n = x.shape[0]
    power, needs_b, extras = _gather_extras(kind, b, rhs, q)
    n_extras3d = sum(1 for a in extras if a.ndim == 3)
    n_plane = 2 + 2 * n_extras3d  # 2CB deep each
    cb = _depth_for(n, n_plane, choices=(4, 2))
    if cb < 2 or (n // 2) % cb != 0:
        n_out = 2 + int(needs_b)
        yb = _yb_for(n, 2, n_extras3d, n_out)
        if yb is not None and n % 4 == 0 and (n // 2) % 2 == 0:
            return _restrict3_yblocked(kind, x, b, rhs, q, needs_b, power,
                                       2, yb)
        return _xla_restrict3(kind, x, b, rhs, q, needs_b, power)
    depth = 2 * cb
    grid, in_specs = _full_specs(n, depth, len(extras), extras)
    m = n // 2

    def kernel(prev_ref, cen_ref, nxt_ref, *rest):
        refs = list(rest)
        outs = [refs.pop() for _ in range(2 + int(needs_b))][::-1]
        bb = refs.pop(0)[...] if needs_b else None
        rr = refs.pop(0)[...] if rhs is not None else None
        qq = refs.pop(0)[0, 0] if kind in ("cubic", "quartic") else None
        xc = cen_ref[...]
        S = _full_neighbour_sum(prev_ref[...], xc, nxt_ref[...], power)
        r = _residual_block(kind, n, xc, S, bb, qq, rr)
        outs[0][...] = _restrict_block(r)
        outs[1][...] = _restrict_block(xc)
        if needs_b:
            outs[2][...] = _restrict_block(bb)

    Z = np.int32(0)
    centre_c = lambda i: (i.astype(jnp.int32)  # noqa: E731
                          if hasattr(i, "astype") else np.int32(i), Z, Z)
    n_out = 2 + int(needs_b)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec((cb, m, m), centre_c)
                        for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((m, m, m), F32)
                        for _ in range(n_out)),
        interpret=_interpret(),
    )(x, x, x, *extras)
    return out


def _expand_mats(m: int):
    """Trilinear 2x expansion matrices (mesh._prolong_axis weights):
    Ey (2m, m) expands sublanes from the left, Ez (m, 2m) lanes from the
    right. Fine even row 2r = 0.75 x[r] + 0.25 x[(r-1) % m]; odd row
    2r+1 = 0.75 x[r] + 0.25 x[(r+1) % m]."""
    n = 2 * m
    m32 = np.int32(m)  # keep arithmetic i32 under jax_enable_x64
    f = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    r = f >> 1
    odd = f & 1
    side = jax.lax.rem(r - np.int32(1) + np.int32(2) * odd + m32, m32)
    Ey = (NF32(0.75) * (c == r).astype(F32)
          + NF32(0.25) * (c == side).astype(F32))
    fz = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    cz = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    rz = fz >> 1
    oddz = fz & 1
    sidez = jax.lax.rem(rz - np.int32(1) + np.int32(2) * oddz + m32, m32)
    Ez = (NF32(0.75) * (cz == rz).astype(F32)
          + NF32(0.25) * (cz == sidez).astype(F32))
    return Ey, Ez


def add_prolongation(y, x_c):
    """y + trilinear_prolongation(x_c) in one streaming pass over the
    fine lattice (mesh.add_prolongation). The coarse lattice rides the
    pipeline as CB-plane centre blocks + 2 periodic halo planes; the
    in-plane 2x expansions are MXU matmuls."""
    n = y.shape[0]
    m = n // 2
    # plane budget: fine y in + fine out (2CB each) dominate; coarse is 1/4
    cb = _depth_for(n, 5, choices=(4, 2, 1))
    depth = 2 * cb
    grid = m // cb
    Z = np.int32(0)

    def to32(i):
        return i.astype(jnp.int32) if hasattr(i, "astype") else np.int32(i)

    def halo_c(d):
        def f(i):
            return (jax.lax.rem(to32(i) * np.int32(cb) + np.int32(m + d),
                                np.int32(m)), Z, Z)

        return f

    centre_c = lambda i: (to32(i), Z, Z)  # noqa: E731
    centre_f = lambda i: (to32(i), Z, Z)  # noqa: E731

    def kernel(cprev_ref, ccen_ref, cnxt_ref, y_ref, out_ref):
        ext = jnp.concatenate(
            [cprev_ref[...], ccen_ref[...], cnxt_ref[...]], axis=0)
        Ey, Ez = _expand_mats(m)
        yf = y_ref[...]
        planes = []
        for j in range(cb):
            cm1, cc, cp1 = ext[j], ext[j + 1], ext[j + 2]
            even = NF32(0.75) * cc + NF32(0.25) * cm1
            odd = NF32(0.75) * cc + NF32(0.25) * cp1
            planes.append(_hipdot(_hipdot(Ey, even), Ez))
            planes.append(_hipdot(_hipdot(Ey, odd), Ez))
        out_ref[...] = yf + jnp.stack(planes, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, m, m), halo_c(-1)),
            pl.BlockSpec((cb, m, m), centre_c),
            pl.BlockSpec((1, m, m), halo_c(cb)),
            pl.BlockSpec((depth, n, n), centre_f),
        ],
        out_specs=pl.BlockSpec((depth, n, n), centre_f),
        out_shape=jax.ShapeDtypeStruct((n, n, n), F32),
        interpret=_interpret(),
    )(x_c, x_c, x_c, y)
