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
