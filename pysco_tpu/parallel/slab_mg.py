"""Slab-sharded geometric multigrid: linear V-cycles and FAS over ICI.

The x-slab analogue of models/multigrid.py (reference multigrid.py): the
7-point stencils and red-black sweeps exchange one-plane halos with
``ppermute`` per half-sweep, restriction/prolongation act locally per slab
(x pairs never straddle a slab boundary because slab heights are powers of
two), and once a level's slab gets too thin the tiny coarse grid is
``all_gather``-ed and the remaining levels run replicated through
models/multigrid.py -- coarse grids below ~32^3 cost microseconds, so
sharding them would only buy latency.

The red/black checkerboard parity is GLOBAL ((i + plane0 + j + k) & 1), so
a sharded sweep updates exactly the same cells in the same order as the
single-device sweep and the results agree to float32 rounding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..models import cubic as cubic_mod
from ..models import laplacian as lap
from ..models import multigrid as mg
from ..models import quartic as quartic_mod
from ..models.laplacian import F_RELAX
from ..ops import mesh as mesh_ops
from .slab import AXIS, exchange_halo_x

F32 = jnp.float32

# gather-to-replicated threshold: levels with a GLOBAL grid at or below
# this size run through models/multigrid.py on every shard
REPLICATE_BELOW = 32


def _global_parity(planes: int, m: int):
    r = lax.axis_index(AXIS)
    ii = lax.broadcasted_iota(jnp.int32, (planes, m, m), 0) + r * planes
    jj = lax.broadcasted_iota(jnp.int32, (planes, m, m), 1)
    kk = lax.broadcasted_iota(jnp.int32, (planes, m, m), 2)
    return (ii + jj + kk) & 1


def neighbour_sum_slab(x: jax.Array, n_dev: int) -> jax.Array:
    ext = exchange_halo_x(x, 1, n_dev)
    return (
        ext[:-2]
        + ext[2:]
        + jnp.roll(x, 1, 1)
        + jnp.roll(x, -1, 1)
        + jnp.roll(x, 1, 2)
        + jnp.roll(x, -1, 2)
    )


def operator_slab(x: jax.Array, n_dev: int) -> jax.Array:
    """7-point Laplacian on the slab (laplacian.operator)."""
    m = x.shape[1]
    return (neighbour_sum_slab(x, n_dev) - F32(6) * x) * F32(m * m)


def residual_error_slab(x, b, n_dev) -> jax.Array:
    r = b - operator_slab(x, n_dev)
    return jnp.sqrt(lax.psum(jnp.sum(r * r), AXIS))


def restriction_slab(x: jax.Array) -> jax.Array:
    """Full-weighting restriction; x pairs are slab-local."""
    return mesh_ops.restriction(x)


def prolongation_slab(x: jax.Array, n_dev: int) -> jax.Array:
    """Trilinear prolongation; the x-axis doubling needs 1-plane halos."""
    ext = exchange_halo_x(x, 1, n_dev)
    c = F32(0.75) * x
    even = c + F32(0.25) * ext[:-2]
    odd = c + F32(0.25) * ext[2:]
    cfg_even = [(0, 1, 1), (0, 0, 0), (0, 0, 0)]
    cfg_odd = [(1, 0, 1), (0, 0, 0), (0, 0, 0)]
    zero = F32(0)
    out = lax.pad(even, zero, cfg_even) + lax.pad(odd, zero, cfg_odd)
    for axis in (1, 2):
        out = mesh_ops._prolong_axis(out, axis)
    return out


def gauss_seidel_slab(x, b, n_dev: int, f_relax: float = F_RELAX,
                      rhs=None) -> jax.Array:
    """Masked red-black over-relaxed sweep with global parity; one halo
    exchange per colour half (the opposite colour is frozen during a
    half). Reference semantics for the packed fast path below --
    :func:`smoothing_slab` must agree bit-exactly (tests/test_slab_mg).

    With ``rhs`` it smooths the reformulated FAS equation
    x = (sum_nb - h^2 b)/6 + rhs (laplacian.gauss_seidel_with_rhs)."""
    planes, m = x.shape[0], x.shape[1]
    h2b = F32(1.0 / (m * m)) * b
    invsix = F32(1.0 / 6.0)
    fr = F32(f_relax)
    parity = _global_parity(planes, m)

    def half(i, x):
        mask = parity == (1 - i)
        x_target = (neighbour_sum_slab(x, n_dev) - h2b) * invsix
        if rhs is not None:
            x_target = x_target + rhs
        return jnp.where(mask, x + fr * (x_target - x), x)

    return half(1, half(0, x))


# ---------------------------------------------------------------------------
# Packed red-black half-lattices on the slab
#
# Same scheme as models/laplacian.py (pack along y with the i/k parity
# s(i,k) so every load and flop is useful -- half the bandwidth and half
# the root solves of the masked sweep), except s uses the GLOBAL plane
# index i + r*planes so the packing is consistent across shards, and the
# two x-neighbours (which sit at the SAME packed (jp, k) index of the
# opposite colour) come from a 1-plane ppermute halo instead of a roll.
# Addition order matches neighbour_sum_slab (x-, x+, y-, y+, z-, z+) so
# results are bit-identical to gauss_seidel_slab.
# ---------------------------------------------------------------------------


def _parity_ik_slab(planes: int, m: int):
    """s(i, k) = (i_global + k) & 1 as a bool (planes, 1, m) mask."""
    r = lax.axis_index(AXIS)
    ii = lax.broadcasted_iota(jnp.int32, (planes, 1, m), 0) + r * planes
    kk = lax.broadcasted_iota(jnp.int32, (planes, 1, m), 2)
    return ((ii + kk) & 1) == 1


def pack_rb_slab(x: jax.Array):
    """Split a (planes, m, m) slab into (red, black) (planes, m/2, m)
    half-lattices; red = odd GLOBAL parity (laplacian.pack_rb)."""
    planes, m = x.shape[0], x.shape[1]
    x5 = x.reshape(planes, m // 2, 2, m)
    s1 = _parity_ik_slab(planes, m)
    even, odd = x5[:, :, 0, :], x5[:, :, 1, :]
    red = jnp.where(s1, even, odd)
    black = jnp.where(s1, odd, even)
    return red, black


def unpack_rb_slab(red: jax.Array, black: jax.Array) -> jax.Array:
    planes, m = red.shape[0], red.shape[2]
    s1 = _parity_ik_slab(planes, m)
    even = jnp.where(s1, red, black)
    odd = jnp.where(s1, black, red)
    return jnp.stack((even, odd), axis=2).reshape(planes, m, m)


def packed_neighbour_sum_slab(src: jax.Array, to_red: bool,
                              n_dev: int) -> jax.Array:
    """Sum of the 6 stencil neighbours of each `to_red` (else black)
    cell, read from the opposite-colour half-lattice ``src``
    (laplacian.packed_neighbour_sum with the i-rolls replaced by a
    1-plane halo exchange -- x-neighbours keep the packed y index)."""
    planes, m = src.shape[0], src.shape[2]
    s1 = _parity_ik_slab(planes, m)
    ext = exchange_halo_x(src, 1, n_dev)
    if to_red:
        ym = jnp.where(s1, jnp.roll(src, 1, 1), src)
        yp = jnp.where(s1, src, jnp.roll(src, -1, 1))
    else:
        ym = jnp.where(s1, src, jnp.roll(src, 1, 1))
        yp = jnp.where(s1, jnp.roll(src, -1, 1), src)
    return (
        ext[:-2]
        + ext[2:]
        + ym
        + yp
        + jnp.roll(src, 1, 2)
        + jnp.roll(src, -1, 2)
    )


def smoothing_slab(x, b, n_smoothing: int, n_dev: int, rhs=None,
                   f_relax: float = F_RELAX):
    """n_smoothing packed red-black sweeps (one pack/unpack round trip),
    bit-identical to looping :func:`gauss_seidel_slab` -- the shared
    driver (laplacian._smoothing_packed) with the slab packing/halo
    primitives injected."""
    return lap._smoothing_packed(
        x, b, n_smoothing, rhs, f_relax,
        pack=pack_rb_slab, unpack=unpack_rb_slab,
        neighbour_sum=lambda src, to_red: packed_neighbour_sum_slab(
            src, to_red, n_dev),
    )


def _gather_full(x_local: jax.Array) -> jax.Array:
    return lax.all_gather(x_local, AXIS, axis=0, tiled=True)


def _local_slice(x_full: jax.Array, n_dev: int) -> jax.Array:
    planes = x_full.shape[0] // n_dev
    r = lax.axis_index(AXIS)
    return lax.dynamic_slice_in_dim(x_full, r * planes, planes, axis=0)


def truncation_error_slab(x, n_dev) -> jax.Array:
    t = restriction_slab(operator_slab(x, n_dev)) - operator_slab(
        restriction_slab(x), n_dev
    )
    return jnp.sqrt(lax.psum(jnp.sum(t * t), AXIS))


# per-leg recursion kinds: V is one leg; F recurses F then V (with an
# Npre smooth between legs); W recurses W twice. Matches the leg
# structure of models/multigrid.py:154-199 (reference multigrid.py:474-858).
_LEGS = {"V": ("V",), "F": ("F", "V"), "W": ("W", "W")}


def cycle_slab(x, b, ncoarse: int, Npre: int, Npost: int, n_dev: int,
               level: int = 0, kind: str = "V"):
    """Linear V/F/W cycle on the slab; thin coarse levels continue
    replicated through models/multigrid (identical maths on every shard)."""
    mg_cycles = {"V": mg.V_cycle, "F": mg.F_cycle, "W": mg.W_cycle}
    for sub in _LEGS[kind]:
        x = smoothing_slab(x, b, Npre, n_dev)
        res_c = restriction_slab(b - operator_slab(x, n_dev))
        x_c = lap.initialise_potential(res_c)
        if mg._coarsest(level, ncoarse):
            x_c = smoothing_slab(x_c, res_c, Npre, n_dev)
        elif res_c.shape[0] < 4 or res_c.shape[1] <= REPLICATE_BELOW:
            res_full = _gather_full(res_c)
            x_full = mg_cycles[sub](
                lap.initialise_potential(res_full), res_full, ncoarse,
                Npre, Npost, level + 1,
            )
            x_c = _local_slice(x_full, n_dev)
        else:
            x_c = cycle_slab(x_c, res_c, ncoarse, Npre, Npost, n_dev,
                             level + 1, sub)
        x = x + prolongation_slab(x_c, n_dev)
    return smoothing_slab(x, b, Npost, n_dev)


def V_cycle_slab(x, b, ncoarse: int, Npre: int, Npost: int, n_dev: int,
                 level: int = 0):
    return cycle_slab(x, b, ncoarse, Npre, Npost, n_dev, level, "V")


def linear_slab(x, b, ncoarse: int, Npre: int, Npost: int, tolerance,
                n_dev: int, cycle: str = "V"):
    """Sharded multigrid.linear: V/F/W cycles until the psum'd residual
    norm beats the tolerance or stops improving (multigrid.py:76-82)."""
    tolerance = jnp.asarray(tolerance, F32)

    def cond(carry):
        _, _, it, done = carry
        return (~done) & (it < mg.MAX_CYCLES)

    def body(carry):
        x, prev, it, _ = carry
        x = cycle_slab(x, b, ncoarse, Npre, Npost, n_dev, 0, cycle)
        err = residual_error_slab(x, b, n_dev)
        done = (err <= tolerance) | (err * F32(2) > prev)
        return (x, err, it + 1, done)

    x, _, _, _ = lax.while_loop(
        cond, body, (x, F32(1e30), jnp.int32(0), jnp.bool_(False))
    )
    return x


# ---------------------------------------------------------------------------
# FAS (nonlinear) slab cycles
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SlabFASOps:
    """Slab counterpart of models.multigrid.FASOps; also carries the
    replicated ops for the gathered coarse levels."""

    smoothing: Callable  # (x, b, n, rhs) -> x            [slab]
    operator: Callable  # (x, b) -> array                 [slab]
    gauss_seidel_masked: Callable  # (x, b, rhs) -> x; reference sweep
    restrict_residual: Callable  # (x, b, rhs) -> coarse  [slab]
    residual_error: Callable  # (x, b) -> scalar (psum)   [slab]
    truncation_error: Callable  # (x, b) -> scalar (psum) [slab]
    replicated: mg.FASOps


def _neighbour_pow_sum_slab(x, n_dev, power):
    xp = x * x if power == 2 else x * x * x
    ext = exchange_halo_x(xp, 1, n_dev)
    return (
        ext[:-2]
        + ext[2:]
        + jnp.roll(xp, 1, 1)
        + jnp.roll(xp, -1, 1)
        + jnp.roll(xp, 1, 2)
        + jnp.roll(xp, -1, 2)
    )


def _fas_ops_scalaron_slab(q, n_dev: int, n_power: int,
                           exact_root: bool) -> SlabFASOps:
    """f(R) scalaron ops on the slab: u^(n+1) + p u + q h^2 with
    p = h^2 b - (1/6) sum_nb u^n (cubic n_power=2 / quartic n_power=3)."""
    mod = cubic_mod if n_power == 2 else quartic_mod

    def p_term(x, b):
        m = x.shape[1]
        h2 = F32(1.0 / (m * m))
        return h2 * b - F32(1.0 / 6.0) * _neighbour_pow_sum_slab(
            x, n_dev, n_power
        )

    def operator(x, b):
        m = x.shape[1]
        qh2 = F32(q) * F32(1.0 / (m * m))
        p = p_term(x, b)
        xpow = x * x * x if n_power == 2 else x * x * x * x
        return xpow + p * x + qh2

    def gauss_seidel(x, b, rhs):
        m = x.shape[1]
        h2 = 1.0 / (m * m)
        fr = F32(F_RELAX)
        parity = _global_parity(x.shape[0], m)
        if exact_root:
            # same f64 closed-form roots as the single-device sweeps
            # (cubic.py:159-169 / quartic.py:152-163 in this repo)
            if n_power == 2:
                d1_q = 27.0 * h2 * jnp.asarray(q, jnp.float64)
                d1 = d1_q if rhs is None else d1_q - 27.0 * rhs.astype(
                    jnp.float64)
            else:
                q_eff_base = h2 * jnp.asarray(q, jnp.float64)
                q_eff = (q_eff_base if rhs is None
                         else q_eff_base - rhs.astype(jnp.float64))
        else:
            c0_q = F32(h2) * jnp.asarray(q, F32)
            c0 = c0_q if rhs is None else c0_q - rhs

        def half(i, x):
            mask = parity == (1 - i)
            p = p_term(x, b)
            if exact_root:
                if n_power == 2:
                    x_new = mod.solution_cubic_equation(p, d1).astype(F32)
                else:
                    x_new = mod.solution_quartic_equation(p, q_eff).astype(F32)
            else:
                x_new = mod._newton_root(x, p, c0)
            return jnp.where(mask, x + fr * (x_new - x), x)

        return half(1, half(0, x))

    def smoothing(x, b, n, rhs=None):
        """n packed red-black sweeps (cubic.smoothing / quartic.smoothing
        on the slab): the shared scalaron driver
        (laplacian.packed_scalaron_smoothing) with the slab packing/halo
        primitives injected -- bit-identical to looping
        ``gauss_seidel``."""
        return lap.packed_scalaron_smoothing(
            x, b, q, n, rhs, exact_root, n_power=n_power,
            newton_root=mod._newton_root,
            exact_solve=(mod.solution_cubic_equation if n_power == 2
                         else mod.solution_quartic_equation),
            exact_scale=27.0 if n_power == 2 else 1.0,
            pack=pack_rb_slab, unpack=unpack_rb_slab,
            neighbour_sum=lambda src, to_red: packed_neighbour_sum_slab(
                src, to_red, n_dev),
        )

    def restrict_residual(x, b, rhs=None):
        r = operator(x, b)
        if rhs is None:
            return -restriction_slab(r)
        return restriction_slab(rhs - r)

    def residual_error(x, b):
        r = operator(x, b)
        return jnp.sqrt(lax.psum(jnp.sum(r * r), AXIS))

    def truncation_error(x, b):
        RLx = restriction_slab(operator(x, b))
        LRx = operator(restriction_slab(x), restriction_slab(b))
        t = F32(4) * RLx - LRx
        return jnp.sqrt(lax.psum(jnp.sum(t * t), AXIS))

    replicated = (
        mg.fas_ops_cubic(q, exact_root) if n_power == 2
        else mg.fas_ops_quartic(q, exact_root)
    )
    return SlabFASOps(
        smoothing=smoothing,
        operator=operator,
        gauss_seidel_masked=gauss_seidel,
        restrict_residual=restrict_residual,
        residual_error=residual_error,
        truncation_error=truncation_error,
        replicated=replicated,
    )


def fas_ops_cubic_slab(q, n_dev: int, exact_root: bool = False) -> SlabFASOps:
    return _fas_ops_scalaron_slab(q, n_dev, 2, exact_root)


def fas_ops_quartic_slab(q, n_dev: int,
                         exact_root: bool = False) -> SlabFASOps:
    return _fas_ops_scalaron_slab(q, n_dev, 3, exact_root)


def cycle_FAS_slab(x, b, ops: SlabFASOps, ncoarse: int, Npre: int,
                   Npost: int, n_dev: int, level: int = 0,
                   rhs: Optional[jax.Array] = None, kind: str = "V"):
    """FAS V/F/W cycle on the slab (tau-correction as
    multigrid.py:557-566); thin coarse levels continue replicated via
    models/multigrid. Leg structure identical to :func:`cycle_slab`."""
    mg_cycles = {"V": mg.V_cycle_FAS, "F": mg.F_cycle_FAS,
                 "W": mg.W_cycle_FAS}
    for sub in _LEGS[kind]:
        x = ops.smoothing(x, b, Npre, rhs)
        res_c = ops.restrict_residual(x, b, rhs)
        x_c = restriction_slab(x)
        b_c = restriction_slab(b)
        res_c = F32(4) * res_c + ops.operator(x_c, b_c)
        if mg._coarsest(level, ncoarse):
            x_corr_c = ops.smoothing(x_c, b_c, Npre, res_c)
        elif x_c.shape[0] < 4 or x_c.shape[1] <= REPLICATE_BELOW:
            res_full = _gather_full(res_c)
            x_full = _gather_full(x_c)
            b_full = _gather_full(b_c)
            # hand the remaining levels to the replicated FAS cycle;
            # every shard computes the identical correction
            x_corr_full = mg_cycles[sub](
                x_full, b_full, ops.replicated, ncoarse, Npre, Npost,
                level + 1, res_full,
            )
            x_corr_c = _local_slice(x_corr_full, n_dev)
        else:
            x_corr_c = cycle_FAS_slab(
                x_c, b_c, ops, ncoarse, Npre, Npost, n_dev, level + 1,
                res_c, sub,
            )
        x = x + prolongation_slab(x_corr_c - x_c, n_dev)
    return ops.smoothing(x, b, Npost, rhs)


def V_cycle_FAS_slab(x, b, ops: SlabFASOps, ncoarse: int, Npre: int,
                     Npost: int, n_dev: int, level: int = 0,
                     rhs: Optional[jax.Array] = None):
    return cycle_FAS_slab(x, b, ops, ncoarse, Npre, Npost, n_dev, level,
                          rhs, "V")


def FAS_slab(x, b, ops: SlabFASOps, ncoarse: int, Npre: int, Npost: int,
             tolerance, n_dev: int, cycle: str = "V"):
    tolerance = jnp.asarray(tolerance, F32)

    def cond(carry):
        _, _, it, done = carry
        return (~done) & (it < mg.MAX_CYCLES)

    def body(carry):
        x, prev, it, _ = carry
        x = cycle_FAS_slab(x, b, ops, ncoarse, Npre, Npost, n_dev,
                           kind=cycle)
        err = ops.residual_error(x, b)
        done = (err <= tolerance) | (err * F32(2) > prev)
        return (x, err, it + 1, done)

    x, _, _, _ = lax.while_loop(
        cond, body, (x, F32(1e30), jnp.int32(0), jnp.bool_(False))
    )
    return x
