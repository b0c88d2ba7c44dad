"""Dense (scatter-free) particle-mesh transfer: deposition & interpolation.

XLA's scatter/gather on TPU is instruction-serialised (~10^8 updates/s,
see BENCH_NOTES.md) and dominates the PM step. This module replaces both
hot transfers with dense, MXU/VPU-friendly linear algebra:

1. Particles are sorted by their base x-plane index once per force
   evaluation (one multi-operand ``lax.sort`` -- position and velocity
   ride along as payload, so no unsort is ever needed; particle identity
   is irrelevant to the simulation).
2. Plane boundaries come from one small ``searchsorted``.
3. A ``lax.scan`` over the M planes processes each plane's particles
   (dynamic slice with a static capacity ~2x the mean; the
   plane-aggregate density fluctuates by only ~20-30 percent even at z=0
   so overflow is essentially impossible, and is *detected* and reported).
4. Per plane, the transfer becomes dense algebra with banded one-hot
   weight matrices over the y and z axes:

   deposit:  rho[a, y, z] = sum_p Wx[p,a] Wy[p,y] Wz[p,z]
             == (Wx (x) Wy)^T  @  Wz            (one MXU matmul)
   gather:   f[p] = sum_{a,y,z} Wx Wy Wz F[a,y,z]
             == rows of (Wx (x) Wy) @ F_window, then a z-contraction

   where Wx is (CAP, W) over the support planes and Wy/Wz are (CAP, M)
   banded one-hot-weight matrices. The support width W is scheme-native:
   NGP 1, CIC 2 (base = floor(x*M - 1/2)), TSC 3 -- so CIC/NGP pay
   proportionally fewer FLOPs.

5. Plane contributions land on planes base..base+W-1 and are combined
   with W rolls at the end.

This keeps exactly the reference's mass-assignment maths (mesh.py:2240-
3089) while running at HBM bandwidth / MXU rate instead of scatter-issue
rate.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32
I32 = jnp.int32

# f32 matmuls on the MXU: HIGHEST keeps full float32 accuracy (3-pass
# bf16); the transfer weights need it to preserve <0.1% P(k) fidelity.
_PRECISION = lax.Precision.HIGHEST

_WIDTH = {"ngp": 1, "cic": 2, "tsc": 3}


def _capacity(npart: int, ncells_1d: int) -> int:
    """Static per-plane particle capacity.

    The plane-aggregate overdensity is a sum of k_x-axis modes only; for
    typical LCDM boxes its rms is ~0.2-0.3 by z=0, so 2x the mean plus
    slack covers >5 sigma. Overflow is detected and reported regardless.
    """
    cap = int(2.0 * npart / ncells_1d) + 256
    cap = min(cap, npart)
    return ((cap + 255) // 256) * 256


def _base_axis(scheme: str, xs: jax.Array) -> jax.Array:
    """Unwrapped base cell index of the support window along one axis.

    xs = position * M. NGP/TSC anchor on the occupied cell (TSC's window
    starts one below); CIC anchors on floor(xs - 1/2) so its support is
    exactly two cells (equivalent to the reference's sign-dependent
    neighbour, mesh.py:2284).
    """
    scheme = scheme.casefold()
    if scheme == "cic":
        return jnp.floor(xs - F32(0.5)).astype(I32)
    base = jnp.floor(xs).astype(I32)
    if scheme == "tsc":
        return base - 1
    return base  # ngp


def _axis_weights(scheme: str, xs: jax.Array, base: jax.Array):
    """Weights over the W support cells (offsets 0..W-1 from base)."""
    scheme = scheme.casefold()
    if scheme == "tsc":
        # d relative to the occupied cell centre (base + 1)
        d = xs - F32(0.5) - (base + 1).astype(F32)
        half = F32(0.5)
        return (
            half * (half - d) ** 2,
            F32(0.75) - d * d,
            half * (half + d) ** 2,
        )
    if scheme == "cic":
        frac = xs - F32(0.5) - base.astype(F32)
        return (F32(1) - frac, frac)
    if scheme == "ngp":
        return (jnp.ones_like(xs),)
    raise NotImplementedError(scheme)


def sort_by_plane(position: jax.Array, ncells_1d: int, scheme: str, *payload):
    """Sort particles by base x-plane; returns
    (position, *payload, plane_starts). One multi-operand sort keeps all
    per-particle state aligned."""
    xs = position[:, 0] * F32(ncells_1d)
    key = _base_axis(scheme, xs) % ncells_1d
    flat_payload = []
    for arr in payload:
        flat_payload.extend([arr[:, 0], arr[:, 1], arr[:, 2]])
    sorted_ops = lax.sort(
        (key, position[:, 0], position[:, 1], position[:, 2], *flat_payload),
        num_keys=1,
    )
    key_s = sorted_ops[0]
    pos_s = jnp.stack(sorted_ops[1:4], axis=1)
    out_payload = tuple(
        jnp.stack(sorted_ops[4 + 3 * i: 7 + 3 * i], axis=1)
        for i in range(len(payload))
    )
    starts = jnp.searchsorted(
        key_s, jnp.arange(ncells_1d + 1, dtype=I32), side="left"
    ).astype(I32)
    return (pos_s, *out_payload, starts)


def _plane_weights(pos_pad, starts, i, cap, ncells_1d, scheme):
    """Per-plane particle weights: Wx (CAP, W) masked by plane validity,
    plus the banded Wy/Wz (CAP, M) one-hot-weight matrices."""
    start = starts[i]
    seg = lax.dynamic_slice(pos_pad, (start, jnp.int32(0)), (cap, 3))
    xs = seg * F32(ncells_1d)
    bases = [_base_axis(scheme, xs[:, a]) for a in range(3)]
    # unwrapped comparison: base == i, or the single periodic wrap case
    # base == i - M (CIC base can be -1). The x=2.0 sentinel padding rows
    # (base ~ 2M) never match.
    valid = (bases[0] == i) | (bases[0] == i - ncells_1d)
    vmask = valid.astype(F32)
    wx = _axis_weights(scheme, xs[:, 0], bases[0])
    wx = jnp.stack([w * vmask for w in wx], axis=1)  # (CAP, W)
    wy = _banded_onehot(
        bases[1], _axis_weights(scheme, xs[:, 1], bases[1]), ncells_1d
    )
    wz = _banded_onehot(
        bases[2], _axis_weights(scheme, xs[:, 2], bases[2]), ncells_1d
    )
    return wx, wy, wz, valid


def _banded_onehot(base, weights, ncells_1d):
    """(CAP, M) matrix with weights[o] at column (base + o) mod M."""
    lanes = jnp.arange(ncells_1d, dtype=I32)[None, :]
    out = None
    for o, w in enumerate(weights):
        col = ((base + o) % ncells_1d)[:, None]
        term = jnp.where(lanes == col, w[:, None], F32(0))
        out = term if out is None else out + term
    return out


def deposit(position_sorted: jax.Array, plane_starts: jax.Array,
            ncells_1d: int, scheme: str) -> Tuple[jax.Array, jax.Array]:
    """Deposit sorted particles; returns (counts grid, overflow count).

    ``overflow`` is the number of particles that exceeded a plane's static
    capacity (should always be 0; callers surface it as a diagnostic).
    """
    m = ncells_1d
    width = _WIDTH[scheme.casefold()]
    npart = position_sorted.shape[0]
    cap = _capacity(npart, m)
    pos_pad = jnp.concatenate(
        [position_sorted, jnp.full((cap, 3), 2.0, F32)], axis=0
    )

    def body(carry, i):
        wx, wy, wz, _ = _plane_weights(pos_pad, plane_starts, i, cap, m, scheme)
        a = (wx[:, :, None] * wy[:, None, :]).reshape(cap, width * m)
        out = lax.dot_general(
            a, wz, (((0,), (0,)), ((), ())), precision=_PRECISION,
            preferred_element_type=F32,
        )  # (W*M, M)
        return carry, out.reshape(width, m, m)

    _, planes = lax.scan(body, 0, jnp.arange(m, dtype=I32))
    # planes[i, o] contributes to grid plane (i + o) mod M
    grid = planes[:, 0]
    for o in range(1, width):
        grid = grid + jnp.roll(planes[:, o], o, axis=0)
    counts = plane_starts[1:] - plane_starts[:-1]
    overflow = jnp.sum(jnp.maximum(counts - cap, 0))
    return grid, overflow


def gather_vec(field: jax.Array, position_sorted: jax.Array,
               plane_starts: jax.Array, scheme: str) -> jax.Array:
    """Interpolate a vector field (M, M, M, C) at sorted particles.

    Returns (Npart, C) values aligned with the sorted particle order.
    """
    m = field.shape[0]
    ncomp = field.shape[-1]
    width = _WIDTH[scheme.casefold()]
    npart = position_sorted.shape[0]
    cap = _capacity(npart, m)
    pos_pad = jnp.concatenate(
        [position_sorted, jnp.full((cap, 3), 2.0, F32)], axis=0
    )
    # x-plane halo: window covers planes base..base+W-1 with base <= M-1
    f_ext = (
        jnp.concatenate([field, field[: width - 1]], axis=0)
        if width > 1
        else field
    )

    def body(acc, i):
        wx, wy, wz, valid = _plane_weights(
            pos_pad, plane_starts, i, cap, m, scheme
        )
        a = (wx[:, :, None] * wy[:, None, :]).reshape(cap, width * m)
        zero = jnp.int32(0)
        window = lax.dynamic_slice(
            f_ext, (i, zero, zero, zero), (width, m, m, ncomp)
        ).reshape(width * m, m * ncomp)
        t = lax.dot_general(
            a, window, (((1,), (0,)), ((), ())), precision=_PRECISION,
            preferred_element_type=F32,
        ).reshape(cap, m, ncomp)
        vals = jnp.sum(wz[:, :, None] * t, axis=1)  # (CAP, C)
        # merge this plane's values into the running output
        start = plane_starts[i]
        cur = lax.dynamic_slice(acc, (start, zero), (cap, ncomp))
        merged = jnp.where(valid[:, None], vals, cur)
        acc = lax.dynamic_update_slice(acc, merged, (start, zero))
        return acc, None

    acc0 = jnp.zeros((npart + cap, ncomp), F32)
    acc, _ = lax.scan(body, acc0, jnp.arange(m, dtype=I32))
    return acc[:npart]
