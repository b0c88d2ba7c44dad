"""Pallas tile-binned particle-mesh transfer (deposition & interpolation).

The dense engine (ops/dense_pm.py) removed XLA scatter but still builds
O(M)-wide one-hot matrices per particle. This module is the
speed-of-light path: particles are sorted by (x-plane, 8-row y-block)
tile, and a single gridless Pallas kernel walks the tiles sequentially
(on a single-core TPU a pallas grid is a pipelining loop anyway -- and
the axon Mosaic toolchain rejects gridded calls, see ROADMAP.md),
DMA-ing each tile's particle range from HBM and accumulating a small
VMEM window

    window[(a, y_local), z] += Wx[a] * Wy[y_local] * Wz[z]

as one MXU contraction per particle chunk: A ((W*WY), P) built from
lane-layout one-hot compares, Wz (P-or-WZ, ...) from the z support, and
window += A contract_P Wz. Per-tile particle counts are fully dynamic
(no capacity padding, no overflow possible); tile windows are
overlap-added into the grid by pure reshapes/rolls afterwards.

The gather kernel runs the transpose: per tile it DMAs the force-field
window (component-leading layout), contracts A with it per component,
applies the z weights and streams per-chunk particle values back to HBM.
Chunk tails that spill past a tile's range are overwritten by the next
non-empty tile (sequential execution: last write wins), with one chunk
of padding at the end of the output.

Supports NGP/CIC/TSC via the same scheme-native support widths as
ops/dense_pm.py (W = 1/2/3; reference maths mesh.py:2240-3089).
"""

from __future__ import annotations

import sys
from functools import partial

import jax

# Mosaic lowering of the nested-loop mega-kernels recurses deeply
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense_pm import _WIDTH, _axis_weights, _base_axis

F32 = jnp.float32
I32 = jnp.int32

YB = 8  # y-block rows per tile
Q = 512  # padded-layout quantum: every tile's particle range is a multiple
P_DEP = 512  # particles per deposit chunk (== Q so chunk offsets align)
P_GAT = 512  # particles per gather chunk (== Q)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geometry(ncells_1d: int, scheme: str):
    w = _WIDTH[scheme.casefold()]
    wy = YB + w - 1
    wy_pad = _round_up(wy, 8)  # Mosaic slice shapes must be tile-aligned
    rows = w * wy_pad
    wz = ncells_1d + w - 1
    wz_pad = _round_up(wz, 128)
    nby = ncells_1d // YB
    ntiles = ncells_1d * nby
    return w, wy, wy_pad, rows, wz, wz_pad, nby, ntiles


def sort_by_tile(position: jax.Array, ncells_1d: int, scheme: str, *payload):
    """Sort particles by (x-plane, y-block) tile id; returns
    (position, *payload, tile_starts)."""
    m = ncells_1d
    nby = m // YB
    xs = position[:, 0] * F32(m)
    ys = position[:, 1] * F32(m)
    px = _base_axis(scheme, xs) % m
    py = (_base_axis(scheme, ys) % m) // YB
    key = px * nby + py
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
    ntiles = m * nby
    starts = jnp.searchsorted(
        key_s, jnp.arange(ntiles + 1, dtype=I32), side="left"
    ).astype(I32)
    return (pos_s, *out_payload, starts)


def padded_size(npart: int, ncells_1d: int) -> int:
    """Static row count of the persistently padded particle state."""
    nby = ncells_1d // YB
    return npart + ncells_1d * nby * Q


def sort_by_tile_padded(position, flags, ncells_1d: int, scheme: str,
                        *payload):
    """Tile sort with per-tile alignment padding.

    ``position`` has ``padded_size`` rows; ``flags`` is 1.0 on real rows and
    0.0 on pad rows (pad positions/payload are ignored). Two sorts: the
    first groups real particles by tile (pads at the end), the second
    re-keys just enough pads into each tile that every tile's padded count
    is a multiple of Q -- so every tile range is Q-aligned and the Pallas
    kernels need no masked or unaligned DMA at all. The real/pad flag rides
    as the low key bit (reals sort before pads within a tile), saving a
    sort operand.

    Returns (position, flags, *payload, tile_starts) where
    tile_starts[0..T] are all multiples of Q.
    """
    m = ncells_1d
    nby = m // YB
    ntiles = m * nby
    ntot = position.shape[0]
    xs = position[:, 0] * F32(m)
    ys = position[:, 1] * F32(m)
    px = _base_axis(scheme, xs) % m
    py = (_base_axis(scheme, ys) % m) // YB
    keys_real = (px * nby + py).astype(I32)
    keys = jnp.where(
        flags > 0, keys_real * 2, jnp.int32(2 * ntiles + 1)
    )

    flat_payload = []
    for arr in payload:
        flat_payload.extend([arr[:, 0], arr[:, 1], arr[:, 2]])
    ops1 = lax.sort(
        (keys, position[:, 0], position[:, 1], position[:, 2],
         *flat_payload),
        num_keys=1,
    )
    keys1 = ops1[0]
    starts1 = jnp.searchsorted(
        keys1, jnp.arange(ntiles + 1, dtype=I32) * 2, side="left"
    ).astype(I32)
    counts = starts1[1:] - starts1[:-1]
    pad_t = (-counts) % Q
    cum_pad = jnp.cumsum(pad_t).astype(I32)
    # real rows always occupy the first nreal rows after sort 1; pad of
    # rank r joins the first tile t with cum_pad[t] > r (leftovers keep
    # key 2T+1). method='sort' keeps this O((n+T) log) instead of the
    # default per-query scan.
    nreal = ntot - ntiles * Q
    rank = jnp.arange(ntiles * Q, dtype=I32)
    pad_keys = jnp.searchsorted(
        cum_pad, rank, side="right", method="sort"
    ).astype(I32) * 2 + 1
    keys2 = jnp.concatenate([keys1[:nreal], pad_keys])
    ops2 = lax.sort((keys2, *ops1[1:]), num_keys=1)
    flags_s = jnp.where((ops2[0] & 1) == 0, F32(1), F32(0))
    pos_s = jnp.stack(ops2[1:4], axis=1)
    out_payload = tuple(
        jnp.stack(ops2[4 + 3 * i: 7 + 3 * i], axis=1)
        for i in range(len(payload))
    )
    starts2 = jnp.searchsorted(
        ops2[0], jnp.arange(ntiles + 1, dtype=I32) * 2, side="left"
    ).astype(I32)
    return (pos_s, flags_s, *out_payload, starts2)


def pack_particles(position_sorted, flags, chunk: int = Q):
    """Lane-layout packed particle array (4, Npad): rows x, y, z, flag.

    Built once per force evaluation and shared by the deposit and gather
    kernels.
    """
    ntot = position_sorted.shape[0]
    npad = _round_up(ntot, chunk)
    pos_t = jnp.full((4, npad), 2.0, F32)
    pos_t = pos_t.at[:3, :ntot].set(position_sorted.T)
    pos_t = pos_t.at[3, :ntot].set(flags)
    return pos_t


def _build_A(scheme, m, w, wy_pad, rows, pos_chunk, yb, valid):
    """A (rows, P): one-hot of (x-slot, local-y) weight products.

    pos_chunk is (3, P) raw positions in lane layout; yb is the tile's
    y-block index (traced scalar).
    """
    xs = pos_chunk[0:1, :] * F32(m)
    ys = pos_chunk[1:2, :] * F32(m)
    bx = _base_axis(scheme, xs)
    wx = _axis_weights(scheme, xs, bx)
    by = _base_axis(scheme, ys)
    wyw = _axis_weights(scheme, ys, by)
    # wrap-free mod: by in [-1, m-1]; only by = -1 wraps (to m-1)
    by_wrapped = jnp.where(by < 0, by + m, by)
    ylocal = by_wrapped - yb * YB  # [0, YB) for this tile's particles
    p = pos_chunk.shape[1]
    row_ids = lax.broadcasted_iota(I32, (rows, p), 0)
    a_mat = jnp.zeros((rows, p), F32)
    for a in range(w):
        for oy in range(w):
            col = a * wy_pad + ylocal + oy  # (1, P)
            wgt = wx[a] * wyw[oy] * valid  # (1, P)
            a_mat = a_mat + jnp.where(row_ids == col, wgt, F32(0))
    return a_mat


# ---------------------------------------------------------------------------
# Deposit
# ---------------------------------------------------------------------------

def _deposit_kernel(scheme: str, m: int):
    w, wy, wy_pad, rows, wz, wz_pad, nby, ntiles = _geometry(m, scheme)

    def kernel(starts_ref, pos_hbm, zeros_hbm, out_ref):
        del zeros_hbm  # aliased to out_ref (pre-zeroed grid)

        def run(pos_buf, win, region, sem_in, sem_rd, sem_wr):
            def tile_body(t, _):
                start = starts_ref[t]
                end = starts_ref[t + 1]
                yb = lax.rem(t, jnp.int32(nby))
                plane = lax.div(t, jnp.int32(nby))
                win[...] = jnp.zeros((rows, wz_pad), F32)
                n_chunks = lax.div(end - start, jnp.int32(P_DEP))

                def start_dma(c, slot):
                    off = pl.multiple_of(start + c * P_DEP, Q)
                    pltpu.make_async_copy(
                        pos_hbm.at[:, pl.ds(off, P_DEP)],
                        pos_buf.at[slot],
                        sem_in.at[slot],
                    ).start()

                @pl.when(n_chunks > 0)
                def _():
                    start_dma(jnp.int32(0), jnp.int32(0))

                def chunk_body(c, _):
                    slot = lax.rem(c, jnp.int32(2))
                    # prefetch the next chunk while this one computes
                    @pl.when(c + 1 < n_chunks)
                    def _():
                        start_dma(c + 1, lax.rem(c + 1, jnp.int32(2)))

                    off = pl.multiple_of(start + c * P_DEP, Q)
                    pltpu.make_async_copy(
                        pos_hbm.at[:, pl.ds(off, P_DEP)],
                        pos_buf.at[slot],
                        sem_in.at[slot],
                    ).wait()
                    chunk = pos_buf[slot]
                    valid = chunk[3:4, :]  # flag row: 1 real, 0 pad
                    a_mat = _build_A(
                        scheme, m, w, wy_pad, rows, chunk, yb, valid
                    )
                    zs = chunk[2:3, :] * F32(m)
                    bz = _base_axis(scheme, zs)
                    wzw = _axis_weights(scheme, zs, bz)
                    zl = jnp.where(bz < 0, bz + m, bz)
                    zrows = lax.broadcasted_iota(I32, (wz_pad, P_DEP), 0)
                    wz_mat = jnp.zeros((wz_pad, P_DEP), F32)
                    for oz in range(w):
                        wz_mat = wz_mat + jnp.where(
                            zrows == zl + oz, wzw[oz] * valid, F32(0)
                        )
                    win[...] = win[...] + lax.dot_general(
                        a_mat, wz_mat, (((1,), (1,)), ((), ())),
                        preferred_element_type=F32,
                        precision=lax.Precision.HIGHEST,
                    )
                    return 0

                lax.fori_loop(jnp.int32(0), n_chunks, chunk_body, 0)
                # read-modify-write the tile's window region of the padded
                # grid (tiles run sequentially, so no write races)
                rd = pltpu.make_async_copy(
                    out_ref.at[pl.ds(plane, w), pl.ds(yb * YB, wy_pad), :],
                    region, sem_rd,
                )
                rd.start()
                rd.wait()
                region[...] = region[...] + win[...].reshape(w, wy_pad, wz_pad)
                wr = pltpu.make_async_copy(
                    region,
                    out_ref.at[pl.ds(plane, w), pl.ds(yb * YB, wy_pad), :],
                    sem_wr,
                )
                wr.start()
                wr.wait()
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(ntiles), tile_body, 0)

        pl.run_scoped(
            run,
            pos_buf=pltpu.VMEM((2, 4, P_DEP), F32),
            win=pltpu.VMEM((rows, wz_pad), F32),
            region=pltpu.VMEM((w, wy_pad, wz_pad), F32),
            sem_in=pltpu.SemaphoreType.DMA((2,)),
            sem_rd=pltpu.SemaphoreType.DMA,
            sem_wr=pltpu.SemaphoreType.DMA,
        )

    return kernel


def _fold_padded_grid(gp, m: int):
    """Fold the padded deposit grid into (M, M, M).

    Pad regions along each axis hold periodic-wrap contributions for the
    low indices of that axis (the window index ranges guarantee each pad
    cell wraps exactly once; cells beyond are never written and stay 0).
    """
    def fold(arr, axis):
        size = arr.shape[axis]
        head = lax.slice_in_dim(arr, 0, m, axis=axis)
        off = m
        while off < size:
            hi = min(off + m, size)
            piece = lax.slice_in_dim(arr, off, hi, axis=axis)
            idx = [slice(None)] * arr.ndim
            idx[axis] = slice(0, hi - off)
            head = head.at[tuple(idx)].add(piece)
            off = hi
        return head

    return fold(fold(fold(gp, 2), 1), 0)


@partial(jax.jit, static_argnums=(3, 4, 5))
def deposit(position_sorted, flags, tile_starts, ncells_1d: int, scheme: str,
            interpret: bool = False) -> jax.Array:
    """Deposit padded-tile-sorted particles; returns the counts grid.

    ``position_sorted``/``flags`` come from :func:`sort_by_tile_padded`
    (every tile range a multiple of Q, pads flagged 0). The kernel
    accumulates straight into a padded grid (read-modify-write per tile;
    safe because tiles run sequentially), so peak memory is one grid.
    """
    m = ncells_1d
    scheme = scheme.casefold()
    w, wy, wy_pad, rows, wz, wz_pad, nby, ntiles = _geometry(m, scheme)
    pos_t = (position_sorted if position_sorted.ndim == 2
             and position_sorted.shape[0] == 4
             else pack_particles(position_sorted, flags))

    gp_shape = (m + w - 1, m + wy_pad - YB, wz_pad)
    zeros = jnp.zeros(gp_shape, F32)
    gp = pl.pallas_call(
        _deposit_kernel(scheme, m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(gp_shape, F32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(tile_starts, pos_t, zeros)
    return _fold_padded_grid(gp, m)


# ---------------------------------------------------------------------------
# Gather
# ---------------------------------------------------------------------------

def _gather_kernel(scheme: str, m: int, ncomp: int):
    w, wy, wy_pad, rows, wz, wz_pad, nby, ntiles = _geometry(m, scheme)

    def kernel(starts_ref, pos_hbm, fext_hbm, out_ref):
        def run(pos_buf, fwin, out_buf, sem_in, sem_f, sem_out):
            def tile_body(t, _):
                start = starts_ref[t]
                end = starts_ref[t + 1]
                yb = lax.rem(t, jnp.int32(nby))
                plane = lax.div(t, jnp.int32(nby))
                fdma = pltpu.make_async_copy(
                    fext_hbm.at[:, pl.ds(plane, w), pl.ds(yb * YB, wy_pad), :],
                    fwin,
                    sem_f,
                )
                fdma.start()
                fdma.wait()

                n_chunks = lax.div(end - start, jnp.int32(P_GAT))

                def start_dma(c, slot):
                    off = pl.multiple_of(start + c * P_GAT, Q)
                    pltpu.make_async_copy(
                        pos_hbm.at[:, pl.ds(off, P_GAT)],
                        pos_buf.at[slot],
                        sem_in.at[slot],
                    ).start()

                @pl.when(n_chunks > 0)
                def _():
                    start_dma(jnp.int32(0), jnp.int32(0))

                def chunk_body(c, _):
                    slot = lax.rem(c, jnp.int32(2))
                    # prefetch the next particle chunk during compute
                    @pl.when(c + 1 < n_chunks)
                    def _():
                        start_dma(c + 1, lax.rem(c + 1, jnp.int32(2)))

                    off = pl.multiple_of(start + c * P_GAT, Q)
                    pltpu.make_async_copy(
                        pos_hbm.at[:, pl.ds(off, P_GAT)],
                        pos_buf.at[slot],
                        sem_in.at[slot],
                    ).wait()
                    chunk = pos_buf[slot]
                    valid = chunk[3:4, :]  # flag row
                    a_mat = _build_A(
                        scheme, m, w, wy_pad, rows, chunk, yb, valid
                    )
                    # lane-layout z one-hot weights (WZpad, P)
                    zs = chunk[2:3, :] * F32(m)
                    bz = _base_axis(scheme, zs)
                    wzw = _axis_weights(scheme, zs, bz)
                    zl = jnp.where(bz < 0, bz + m, bz)
                    zrows = lax.broadcasted_iota(I32, (wz_pad, P_GAT), 0)
                    wz_mat = jnp.zeros((wz_pad, P_GAT), F32)
                    for oz in range(w):
                        wz_mat = wz_mat + jnp.where(
                            zrows == zl + oz, wzw[oz], F32(0)
                        )
                    # wait for the previous chunk's output write before
                    # reusing its buffer slot
                    @pl.when(c >= 2)
                    def _():
                        off_prev = pl.multiple_of(
                            start + (c - 2) * P_GAT, Q
                        )
                        pltpu.make_async_copy(
                            out_buf.at[slot],
                            out_ref.at[:, pl.ds(off_prev, P_GAT)],
                            sem_out.at[slot],
                        ).wait()
                    for comp in range(ncomp):
                        fw = fwin[comp].reshape(rows, wz_pad)
                        # (WZpad, P) = window^T-contraction with A
                        t1t = lax.dot_general(
                            fw, a_mat, (((0,), (0,)), ((), ())),
                            preferred_element_type=F32,
                            precision=lax.Precision.HIGHEST,
                        )
                        vals = jnp.sum(
                            t1t * wz_mat, axis=0, keepdims=True
                        )  # (1, P)
                        out_buf[slot, comp:comp + 1, :] = vals
                    pltpu.make_async_copy(
                        out_buf.at[slot],
                        out_ref.at[:, pl.ds(off, P_GAT)],
                        sem_out.at[slot],
                    ).start()
                    return 0

                lax.fori_loop(jnp.int32(0), n_chunks, chunk_body, 0)
                # drain the last (up to) two output writes
                def drain(c, _):
                    @pl.when(c >= jnp.maximum(n_chunks - 2, 0))
                    def _():
                        slot = lax.rem(c, jnp.int32(2))
                        off_d = pl.multiple_of(start + c * P_GAT, Q)
                        pltpu.make_async_copy(
                            out_buf.at[slot],
                            out_ref.at[:, pl.ds(off_d, P_GAT)],
                            sem_out.at[slot],
                        ).wait()
                    return 0

                lax.fori_loop(
                    jnp.maximum(n_chunks - 2, 0), n_chunks, drain, 0
                )
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(ntiles), tile_body, 0)

        pl.run_scoped(
            run,
            pos_buf=pltpu.VMEM((2, 4, P_GAT), F32),
            fwin=pltpu.VMEM((ncomp, w, wy_pad, wz_pad), F32),
            out_buf=pltpu.VMEM((2, 4, P_GAT), F32),
            sem_in=pltpu.SemaphoreType.DMA((2,)),
            sem_f=pltpu.SemaphoreType.DMA,
            sem_out=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


@partial(jax.jit, static_argnums=(4, 5))
def gather_vec(field, position_sorted, flags, tile_starts, scheme: str,
               interpret: bool = False) -> jax.Array:
    """Interpolate an (M, M, M, C) field at padded-tile-sorted particles.

    Returns (Ntot, C) values aligned with the sorted rows; pad rows are
    zeroed via their flags.
    """
    m = field.shape[0]
    ncomp = field.shape[-1]
    scheme = scheme.casefold()
    w, wy, wy_pad, rows, wz, wz_pad, nby, ntiles = _geometry(m, scheme)
    ntot = position_sorted.shape[0] if position_sorted.ndim == 2 and position_sorted.shape[1] == 3 else flags.shape[0]
    pos_t = (position_sorted if position_sorted.shape[0] == 4
             else pack_particles(position_sorted, flags))
    npad = pos_t.shape[1]

    # component-leading extended field: slot a of plane key reads plane
    # (key + a) mod m; y rows yb*YB..+wy_pad-1; z cells 0..wz-1
    fc = jnp.moveaxis(field, -1, 0)  # (C, M, M, M)
    if w > 1:
        fc = jnp.concatenate([fc, fc[:, : w - 1]], axis=1)
        fc = jnp.concatenate([fc, fc[:, :, :, : w - 1]], axis=3)
    fc = jnp.concatenate([fc, fc[:, :, : wy_pad - YB]], axis=2)
    fc = jnp.pad(fc, ((0, 0), (0, 0), (0, 0), (0, wz_pad - fc.shape[3])))

    out = pl.pallas_call(
        _gather_kernel(scheme, m, ncomp),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, npad), F32),
        interpret=interpret,
    )(tile_starts, pos_t, fc)
    vals = out[:ncomp, :ntot].T
    # leftover pad rows beyond the last tile are never written
    # (uninitialised); select instead of multiply so NaNs cannot leak
    return jnp.where(flags[:, None] > 0, vals, F32(0))


def plane_starts_from_tile_starts(tile_starts: jax.Array, ncells_1d: int):
    """Tile keys are plane-major, so plane boundaries are a stride view."""
    nby = ncells_1d // YB
    return tile_starts[::nby].astype(I32)
