"""Pallas tile-binned particle-mesh transfer (deposition & interpolation).

The dense engine (ops/dense_pm.py) removed XLA scatter but still builds
O(M)-wide one-hot matrices per particle. This module is the
speed-of-light path on TPU:

- Particle state lives in **column layout** ``(4, N_up)`` (x/y/z rows
  plus a zero spare row for (4, 128) DMA tiling;
  ``N_up = round_up(npart, Q)``; the tail columns hold a sentinel
  position >= 1.5 and zero velocity). Column layout makes the per-step
  tile sort a plain multi-operand ``lax.sort`` over contiguous rows --
  no (N, 3) transposes anywhere on the hot path.
- One sort per force evaluation bins particles by (x-plane, 8-row
  y-block) tile. There is **no alignment padding**: the kernels walk
  each tile's particle range over Q-aligned *covering* chunks and mask
  out-of-range lanes with a (start <= global_index < end) predicate, so
  a chunk straddling a tile boundary is simply processed by both tiles
  with complementary masks.
- A single gridless Pallas kernel walks the tiles sequentially (on a
  single-core TPU a pallas grid is a pipelining loop anyway -- and the
  axon Mosaic toolchain rejects gridded calls), double-buffering each
  tile's particle chunks from HBM and accumulating a small VMEM window

      window[(a, y_local), z] += Wx[a] * Wy[y_local] * Wz[z]

  as one MXU contraction per chunk: A ((W*WY), P) is the factored
  one-hot product of the x-slot and local-y weights, Wz (M, P) is the
  z one-hot with **periodic wrap folded into the one-hot column**
  ((z_base + o) mod M), so the window's z extent is exactly M and no
  z unwrapping pass is needed. Tile windows are overlap-added into a
  padded grid by read-modify-write DMAs -- visited in a stride-2 phase
  order over (y, z) blocks whenever the geometry makes consecutive
  windows disjoint, so the next tile's read flies while the previous
  write is in flight -- and the x/y(/z) pad regions are folded back
  periodically at the end.

The gather kernel runs the transpose: per tile it DMAs the force-field
window (component-leading layout) and contracts all three components
in ONE MXU dot ((3*W*WY, M) x (M, P)), applies the A weights as a VPU
reduction, and merges per-chunk particle values back to HBM with a
read-modify-write so straddling chunks compose correctly.

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

def _dot(a, b, dims, mode: str):
    """MXU contraction at a configurable precision (the deposit/gather
    hot cost at large grids: rows x WZ x P MACs per chunk).

    "f32": lax HIGHEST -- 6-pass bf16 emulation, bit-faithful float32.
    "bf16x3": 3 single-pass dots on hi/lo mantissa splits (Dekker-style;
    drops only the lo x lo term) -- float32-faithful to ~1 ulp at half
    the MXU cost of "f32". "bf16": one native bf16 pass (inputs rounded
    to 8-bit mantissas, ~6x cheaper than "f32"; fine for diagnostics,
    measurably lossy for the science path).
    """
    def d(x, y):
        return lax.dot_general(x, y, dims, preferred_element_type=F32,
                               precision=lax.Precision.DEFAULT)

    if mode == "f32":
        return lax.dot_general(a, b, dims, preferred_element_type=F32,
                               precision=lax.Precision.HIGHEST)
    if mode == "bf16":
        # explicit operand rounding: a no-op on the TPU MXU (which
        # rounds inputs to bf16 in hardware under DEFAULT precision)
        # but makes the CPU interpret path compute the same maths, so
        # fidelity tests measure the real loss
        bf16 = jnp.bfloat16
        return d(a.astype(bf16).astype(F32), b.astype(bf16).astype(F32))
    if mode != "bf16x3":
        raise ValueError(f"unknown pm precision mode {mode!r}")
    bf16 = jnp.bfloat16
    ah = a.astype(bf16).astype(F32)
    bh = b.astype(bf16).astype(F32)
    # Explicit hi/lo splits: every operand is the value actually
    # contracted, so the expression is the same maths on the MXU (which
    # rounds inputs to bf16 -- hi parts are exact, lo parts lose one
    # more rounding) and on the CPU interpret path (full-f32 dots).
    return d(ah, b - bh) + (d(a - ah, bh) + d(ah, bh))

# y-block rows per tile. Trade-off: larger YB means fewer tiles (less
# per-tile loop/DMA overhead) and better y-window pad efficiency
# (wy = YB + w - 1 + 2*drift rounds up to a multiple of 8: at YB=8 a
# CIC window is 9 rows padded to 16 -- 44% waste; at YB=16 it is 17/24),
# but a coarser sort granularity (more particles per tile) and a larger
# VMEM window. Env-tunable for on-chip sweeps (tools/sweep_chunk.sh
# pattern); grids must satisfy ncells_1d % YB == 0.
YB = int(__import__("os").environ.get("PYSCO_TPU_YB", "8"))
assert YB % 8 == 0 and YB > 0, "PYSCO_TPU_YB must be a positive x8"
# Particle chunk size == DMA alignment quantum. The tile loop pays a
# fixed per-chunk overhead (2 DMA round trips + one MXU dispatch), so a
# larger Q amortises latency at the cost of more masked work on
# tile-straddling COVERING chunks -- and that masked work grows as tiles
# shrink: a tile of ~1024 particles covered by ceil-aligned 512-chunks
# wastes ~50% of its MXU lanes, vs ~25% at q=256 (measured at 512^3
# z-blocked CIC: gather drift2 1152 -> 1045 ms at q=256, deposit
# neutral). The per-kernel chunk therefore adapts to the mean tile
# occupancy (:func:`_chunk_q`); PYSCO_TPU_CHUNK forces one value
# everywhere (sweeps), and padding/capacities always use the base Q so
# any q <= Q divides the padded column count.
_Q_ENV = __import__("os").environ.get("PYSCO_TPU_CHUNK")
Q = int(_Q_ENV or "512")
assert Q % 256 == 0 and Q > 0, "PYSCO_TPU_CHUNK must be a positive x256"


def _chunk_q(n_up: int, ntiles: int) -> int:
    """Static per-call chunk size from mean tile occupancy."""
    if _Q_ENV is not None:
        return Q
    return 256 if n_up < 2048 * ntiles else Q
# z-block cells per tile. At very large grids the full-z window wastes
# MXU work: every chunk dot contracts against an (m,)-lane one-hot
# although a particle only touches w cells. Binning tiles in z too (the
# tile key gains a z-block index) shrinks the window's lane extent to
# round_up(ZB + w - 1 + 2*drift, 128), at the price of more tiles and
# hence more window DMA round-trips. Measured on-chip at 512^3 CIC
# (v5e, 2026-08-20): at drift 0 the trade is a wash (deposit/gather =
# 300/423 ms full-z vs 349/396 at ZB=128 -- those kernels are
# DMA/one-hot-build bound), but the drift-WIDENED lazy-mode kernels are
# MXU bound (3x window rows) and gain outright: gather 1025 -> 838 ms
# at drift 1, 1491 -> 1161 at drift 2 (deposit neutral). The production
# default is lazy re-binning, where most steps run widened kernels, so
# "auto" = 128 for m >= 512 (~8% off the sustained late-time step;
# below 512 the 128-lane rounding erases any gain), else m (nbz == 1 is
# the plain y-blocked layout). ZB depends on the GRID ONLY (never on
# scheme/drift): the lazy mode reuses a stale sort across steps with
# growing drift, so tile keys must stay stable. On real TPUs ZB must be
# a multiple of 128 (window DMA offsets are lane-dim slices); tests may
# force small ZB in interpret mode.
_ZB_ENV = __import__("os").environ.get("PYSCO_TPU_ZB", "auto")


def _zb_size(ncells_1d: int) -> int:
    """Static z-block size for a grid (cells per tile along z)."""
    if _ZB_ENV != "auto":
        zb = min(int(_ZB_ENV), ncells_1d)
        assert zb > 0 and ncells_1d % zb == 0, (
            "PYSCO_TPU_ZB must divide ncells_1d"
        )
        return zb
    if ncells_1d >= 512 and ncells_1d % 128 == 0:
        return 128
    return ncells_1d


def n_zblocks(ncells_1d: int) -> int:
    return ncells_1d // _zb_size(ncells_1d)


def n_tiles(ncells_1d: int, n_planes: int | None = None) -> int:
    """Total tile count (the tile_starts array has n_tiles + 1 entries)."""
    if n_planes is None:
        n_planes = ncells_1d
    return n_planes * (ncells_1d // YB) * n_zblocks(ncells_1d)
SENTINEL = 2.0  # tail-column x position (anything >= SENTINEL_MIN)
SENTINEL_MIN = 1.5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_cols(npart: int) -> int:
    """Static column count of the particle state arrays."""
    return _round_up(npart, Q)


def _geometry(ncells_1d: int, scheme: str, n_planes: int | None = None,
              drift: int = 0):
    """Kernel geometry; ``n_planes`` is the local x extent (= ncells_1d on
    a single device, the slab height under sharding). ``drift`` widens
    the tile windows by that many cells on each side so particles that
    moved since the last tile sort still land in their (stale) tile's
    window -- the CFL-bounded lazy re-binning mode."""
    if n_planes is None:
        n_planes = ncells_1d
    w = _WIDTH[scheme.casefold()]
    wx_eff = w + 2 * drift
    wy = YB + w - 1 + 2 * drift
    wy_pad = _round_up(wy, 8)  # Mosaic slice shapes must be tile-aligned
    rows = wx_eff * wy_pad
    zbs = _zb_size(ncells_1d)
    nbz = ncells_1d // zbs
    # nbz == 1: the window spans full z, wrap lives in the one-hot.
    # nbz > 1: block-local z window (wrap via halo/fold like x and y).
    if nbz == 1:
        wz_pad = _round_up(ncells_1d, 128)
    else:
        wz_pad = _round_up(zbs + w - 1 + 2 * drift, 128)
    nby = ncells_1d // YB
    ntiles = n_planes * nby * nbz
    return w, wx_eff, wy_pad, rows, wz_pad, nby, ntiles, zbs, nbz


def to_columns(position, velocity, npart: int):
    """(npart, 3) row-major particles -> column state ((4, N_up) x2).

    Row 3 is zero padding: Mosaic DMA slices along the sublane dimension
    must align to the (4, 128) float32 tile, and XLA pads a (3, N) array
    to 4 sublanes physically anyway. Tail columns get the sentinel
    position (excluded from every tile by the sort key) and zero velocity.
    """
    n_up = padded_cols(npart)
    pos = jnp.full((4, n_up), F32(SENTINEL))
    pos = pos.at[:3, :npart].set(jnp.asarray(position, F32).T)
    pos = pos.at[3].set(F32(0))
    vel = jnp.zeros((4, n_up), F32)
    vel = vel.at[:3, :npart].set(jnp.asarray(velocity, F32).T)
    return pos, vel


def to_columns_host(position, velocity, npart: int):
    """NumPy variant of :func:`to_columns` (host-side, for large states:
    uploading the column layout directly avoids holding both layouts in
    HBM during the first force evaluation)."""
    import numpy as np

    n_up = padded_cols(npart)
    pos = np.full((4, n_up), SENTINEL, np.float32)
    pos[:3, :npart] = np.asarray(position, np.float32).T
    pos[3] = 0.0
    vel = np.zeros((4, n_up), np.float32)
    vel[:3, :npart] = np.asarray(velocity, np.float32).T
    return pos, vel


def tile_keys(position, ncells_1d: int, scheme: str, plane0=0,
              n_planes: int | None = None) -> jax.Array:
    """(N_up,) i32 tile id per column; sentinel tail keys past the last
    tile. Under slab sharding ``plane0``/``n_planes`` select the local
    x-plane range (tile id is slab-local; out-of-slab planes also key past
    the end, so foreign particles are dropped rather than misbinned)."""
    m = ncells_1d
    if n_planes is None:
        n_planes = m
    nby = m // YB
    zbs = _zb_size(m)
    nbz = m // zbs
    ntiles = n_planes * nby * nbz
    xs = position[0] * F32(m)
    ys = position[1] * F32(m)
    px = _base_axis(scheme, xs) % m
    py = (_base_axis(scheme, ys) % m) // YB
    p_loc = px - plane0
    key = (p_loc * nby + py).astype(I32)
    if nbz > 1:
        pz = (_base_axis(scheme, position[2] * F32(m)) % m) // zbs
        key = key * I32(nbz) + pz.astype(I32)
    bad = (position[0] >= F32(SENTINEL_MIN)) | (p_loc < 0) | (
        p_loc >= n_planes
    )
    return jnp.where(bad, I32(ntiles), key)


def _block_sort(ops, B: int):
    """Sort each contiguous block of ``B`` columns independently (batched
    ``lax.sort`` along the trailing axis -- much cheaper than one global
    sort over the full column count)."""
    nb = ops[0].shape[0] // B
    res = lax.sort(tuple(o.reshape(nb, B) for o in ops), num_keys=1,
                   dimension=1)
    return tuple(o.reshape(-1) for o in res)


def _nearly_sort(ops, B: int):
    """Two-round shifted block sort for nearly sorted operands.

    Round 1 sorts blocks [jB, (j+1)B); round 2 sorts the half-shifted
    blocks [B/2 + jB, B/2 + (j+1)B) (no wraparound; the outer half
    blocks are already in final position after round 1). Exact whenever
    every element sits within B/2 columns of its globally sorted
    position -- guaranteed here not by construction but by the
    sortedness check + full-sort fallback at the call site.
    """
    n = ops[0].shape[0]
    h = B // 2
    ops = _block_sort(ops, B)
    mid = _block_sort(tuple(o[h:n - h] for o in ops), B)
    return tuple(
        jnp.concatenate((o[:h], m_, o[n - h:]))
        for o, m_ in zip(ops, mid)
    )


def _pow2_block(n: int, block: int) -> int:
    """Largest power-of-two divisor of ``n`` capped at ``block``."""
    return min(block, n & -n)


def sort_particles(position, velocity, ncells_1d: int, scheme: str,
                   plane0=0, n_planes: int | None = None,
                   nearly: bool = False, block: int = 1 << 18,
                   mode: str | None = None):
    """Tile-sort the column state; returns (pos, vel, tile_starts).

    One ``lax.sort`` per force evaluation; ``tile_starts`` has ntiles+1
    entries (tile t's particles occupy columns
    [tile_starts[t], tile_starts[t+1])), not aligned to anything -- the
    kernels mask at chunk granularity instead.

    ``mode`` selects the strategy (``nearly=True`` is a legacy alias for
    ``mode="nearly"``):

    - ``full``: one global 7-operand sort (key + 3 pos + 3 vel).
    - ``nearly``: exploits that between force evaluations particles
      drift by at most ~1 cell (CFL), so the stale order is within a
      bounded column displacement of the new sorted order: a two-round
      shifted block sort (:func:`_nearly_sort`) produces the candidate,
      a cheap key-monotonicity check validates it, and a ``lax.cond``
      falls back to the full sort when the displacement bound was
      violated (heavy clustering, first sort after ICs/restart). Either
      way the result is exactly tile-sorted.
    - ``index``: 2-operand sort (key, iota) followed by one ``take``
      permutation of the six payload rows -- 8 instead of 28 bytes per
      column through the sort's O(log^2 N) compare-exchange passes, at
      the price of one extra random-access gather pass over the
      payload.
    - ``nearly_index``: both.
    """
    m = ncells_1d
    if mode is None:
        mode = "nearly" if nearly else "full"
    if n_planes is None:
        n_planes = m
    ntiles = n_tiles(m, n_planes)
    key = tile_keys(position, m, scheme, plane0, n_planes)
    n = key.shape[0]
    use_index = mode in ("index", "nearly_index")
    use_nearly = mode in ("nearly", "nearly_index")
    if use_index:
        ops_in = (key, jnp.arange(n, dtype=I32))
    else:
        ops_in = (key, position[0], position[1], position[2],
                  velocity[0], velocity[1], velocity[2])
    B = _pow2_block(n, block)
    if use_nearly and B >= 4096 and n // B >= 2:
        cand = _nearly_sort(ops_in, B)
        ok = jnp.all(cand[0][1:] >= cand[0][:-1])
        ops = lax.cond(
            ok,
            lambda full, near: near,
            lambda full, near: lax.sort(full, num_keys=1),
            ops_in, cand,
        )
    else:
        ops = lax.sort(ops_in, num_keys=1)
    if use_index:
        idx = ops[1]
        # row 3 is zero by the column-state invariant (to_columns,
        # _device_state); the permutation preserves it.
        pos_s = jnp.take(position, idx, axis=1)
        vel_s = jnp.take(velocity, idx, axis=1)
    else:
        zero = jnp.zeros_like(ops[1])
        pos_s = jnp.stack((*ops[1:4], zero))
        vel_s = jnp.stack((*ops[4:7], zero))
    starts = jnp.searchsorted(
        ops[0], jnp.arange(ntiles + 1, dtype=I32), side="left"
    ).astype(I32)
    return pos_s, vel_s, starts


def drift_violations(position_sorted, tile_starts, ncells_1d: int,
                     scheme: str, drift: int, plane0=0,
                     n_planes: int | None = None) -> jax.Array:
    """Count particles outside their stale tile's widened window.

    In lazy re-binning mode a particle that moved more than ``drift``
    cells (in x, or past the y window's padded extent) since the last
    sort misses every one-hot and silently deposits zero mass / gathers
    zero force. The host-side CFL bound prevents this; this counter
    DETECTS a violated bound instead of trusting it. The assigned tile of
    column i is recovered from ``tile_starts`` (tile t owns columns
    [starts[t], starts[t+1])). Exact-envelope check mirroring
    :func:`_chunk_weights`: x offset in [-drift, drift]; y offset in
    [-drift, wy_pad - w - drift] (rows beyond the nominal window but
    inside the 8-aligned padding still deposit correctly and fold back).
    """
    m = ncells_1d
    scheme = scheme.casefold()
    w, _, wy_pad, _, wz_pad, nby, ntiles, zbs, nbz = _geometry(
        m, scheme, n_planes, drift
    )
    n_up = position_sorted.shape[1]
    # tile of column i = #{t >= 1 : starts[t] <= i} == searchsorted(
    # starts[1:], i, 'right') -- but computed as an 8K-element scatter of
    # boundary markers + one cumsum instead of a 16.8M-element binary
    # search: per-element searchsorted lowers to log2(ntiles) serial
    # gather passes on TPU (~1.8 s at 256^3, measured -- the same
    # element-granularity pathology as take()); the scatter+cumsum form
    # is bandwidth-bound (~ms).
    bounds = tile_starts[1:]
    marks = jnp.zeros(n_up + 1, I32).at[
        jnp.minimum(bounds, I32(n_up))
    ].add(1, mode="drop")
    tile = jnp.cumsum(marks[:-1], dtype=I32)
    plane = tile // (nby * nbz) + jnp.asarray(plane0, I32)
    yb = (tile // nbz) % nby
    bx = _base_axis(scheme, position_sorted[0] * F32(m)) % m
    by = _base_axis(scheme, position_sorted[1] * F32(m)) % m
    dx = (bx - plane + m + drift) % m  # exact iff <= 2*drift
    dy = (by - yb * YB + m + drift) % m  # exact iff <= wy_pad - w
    real = (position_sorted[0] < F32(SENTINEL_MIN)) & (tile < ntiles)
    bad = (dx > 2 * drift) | (dy > wy_pad - w)
    if nbz > 1:
        zb = tile % nbz
        bz = _base_axis(scheme, position_sorted[2] * F32(m)) % m
        dz = (bz - zb * zbs + m + drift) % m  # exact iff <= wz_pad - w
        bad = bad | (dz > wz_pad - w)
    return jnp.sum((real & bad).astype(I32))


def _chunk_weights(scheme, m, w, wy_pad, pos_chunk, yb, valid, p,
                   plane=None, drift: int = 0, zb=None, zbs=None,
                   nbz: int = 1, wz_pad: int | None = None):
    """Factored one-hot weights for one particle chunk.

    Returns A ((w+2*drift)*wy_pad, P) -- x-slot x local-y one-hot
    products, valid-masked -- and Wz (wz_pad, P). With nbz == 1
    (full-z windows) Wz's column index folds the periodic wrap
    ((z_base + o) mod m); with nbz > 1 (z-blocked tiles) the z one-hot
    is BLOCK-LOCAL like y -- offset from the tile's first z cell
    (+drift shift), wrap handled by the caller's halo/fold.
    ``valid`` enters A only.

    With ``drift > 0`` (lazy re-binning: the tile sort is stale) the x
    window block and local y/z rows come from the MODULAR offset of the
    particle's base from its assigned tile, shifted by +drift -- so a
    particle that moved up to ``drift`` cells since the sort still lands
    in the widened window; anything farther misses every one-hot and
    deposits nothing (prevented by the host-side CFL drift bound).
    """
    wx_eff = w + 2 * drift
    xs = pos_chunk[0:1, :] * F32(m)
    ys = pos_chunk[1:2, :] * F32(m)
    zs = pos_chunk[2:3, :] * F32(m)
    # sentinel columns must never alias into a window (with drift > 0 the
    # modular offset of x = 2.0 can land in range for some planes)
    valid = valid * (xs < F32(SENTINEL_MIN * m)).astype(F32)
    bx = _base_axis(scheme, xs)
    wx = _axis_weights(scheme, xs, bx)
    by = _base_axis(scheme, ys)
    wyw = _axis_weights(scheme, ys, by)
    bz = _base_axis(scheme, zs)
    wzw = _axis_weights(scheme, zs, bz)
    zl = jnp.where(bz < 0, bz + m, bz)
    if nbz > 1:
        # block-local z row (mirrors y): fresh sort puts the base inside
        # [zb*zbs, zb*zbs + zbs); stale sorts may be off by <= drift
        if drift == 0:
            zl = zl - zb * zbs
        else:
            zl_raw = lax.rem(zl - zb * zbs + jnp.int32(2 * m),
                             jnp.int32(m))
            zl = jnp.where(zl_raw >= m - drift, zl_raw - m, zl_raw) + drift

    if drift == 0:
        by_wrapped = jnp.where(by < 0, by + m, by)
        ylocal = by_wrapped - yb * YB  # [0, YB) for this tile's particles
    else:
        yl_raw = lax.rem(by - yb * YB + jnp.int32(2 * m), jnp.int32(m))
        ylocal = jnp.where(yl_raw >= m - drift, yl_raw - m, yl_raw) + drift

    # y one-hot (wy_pad, P)
    yrows = lax.broadcasted_iota(I32, (wy_pad, p), 0)
    wy_oh = jnp.zeros((wy_pad, p), F32)
    for oy in range(w):
        wy_oh = wy_oh + jnp.where(yrows == ylocal + oy, wyw[oy], F32(0))

    if drift == 0:
        # fresh sort: every particle's base plane IS the tile plane, so
        # the x weights fill the window blocks densely
        wxs = jnp.concatenate([wx[a] * valid for a in range(w)], axis=0)
    else:
        dx_raw = lax.rem(bx - plane + jnp.int32(2 * m), jnp.int32(m))
        dx = jnp.where(dx_raw >= m - drift, dx_raw - m, dx_raw) + drift
        xrows = lax.broadcasted_iota(I32, (wx_eff, p), 0)
        wxs = jnp.zeros((wx_eff, p), F32)
        for a in range(w):
            wxs = wxs + jnp.where(xrows == dx + a, wx[a] * valid, F32(0))
    a_mat = (wxs[:, None, :] * wy_oh[None, :, :]).reshape(wx_eff * wy_pad, p)

    if wz_pad is None:
        wz_pad = _round_up(m, 128)
    zrows = lax.broadcasted_iota(I32, (wz_pad, p), 0)
    wz_mat = jnp.zeros((wz_pad, p), F32)
    for oz in range(w):
        zc = zl + oz
        if nbz == 1:
            zc = jnp.where(zc >= m, zc - m, zc)  # periodic wrap in one-hot
        # nbz > 1: no wrap -- the window's spill cells fold/halo outside
        wz_mat = wz_mat + jnp.where(zrows == zc, wzw[oz], F32(0))
    return a_mat, wz_mat


# ---------------------------------------------------------------------------
# Deposit
# ---------------------------------------------------------------------------

def _deposit_kernel(scheme: str, m: int, n_planes: int, drift: int = 0,
                    precision: str = "f32", q: int = Q):
    w, wx_eff, wy_pad, rows, wz_pad, nby, ntiles, zbs, nbz = _geometry(
        m, scheme, n_planes, drift
    )
    # Pipelined (read-ahead / write-behind) tile order: visiting tiles in
    # stride-2 phases over (yb, zb) parity makes CONSECUTIVE visits'
    # window regions disjoint in the extended output array (window y
    # extent <= 2 y-blocks, z extent <= 2 z-blocks, and the plane-wrap
    # visit jumps >= 2 y-blocks when nby >= 4), so tile v+1's region read
    # may fly while tile v's write is still in flight -- the serial
    # per-tile RMW latency hides behind the chunk contraction. Falls back
    # to the strictly serial order when the geometry can't guarantee
    # disjointness (tiny grids / very wide drift windows).
    pipelined = (
        nby >= 4 and wy_pad <= 2 * YB
        and (nbz == 1 or wz_pad <= 2 * zbs)
    )

    def kernel(starts_ref, plane0_ref, pos_hbm, zeros_hbm, out_ref):
        del zeros_hbm  # aliased to out_ref (pre-zeroed grid)

        def run(pos_buf, win, region, sem_in, sem_rd, sem_wr):
            def accumulate(t, yb, zb, gplane, start, end):
                """Sum the tile's particle one-hots into ``win``."""
                win[...] = jnp.zeros((rows, wz_pad), F32)
                c0 = lax.div(start, jnp.int32(q))
                c1 = lax.div(end + jnp.int32(q - 1), jnp.int32(q))

                def start_dma(c, slot):
                    off = pl.multiple_of(c * q, q)
                    pltpu.make_async_copy(
                        pos_hbm.at[:, pl.ds(off, q)],
                        pos_buf.at[slot],
                        sem_in.at[slot],
                    ).start()

                start_dma(c0, lax.rem(c0, jnp.int32(2)))

                def chunk_body(c, _):
                    slot = lax.rem(c, jnp.int32(2))
                    # prefetch the next chunk while this one computes
                    @pl.when(c + 1 < c1)
                    def _():
                        start_dma(c + 1, lax.rem(c + 1, jnp.int32(2)))

                    off = pl.multiple_of(c * q, q)
                    pltpu.make_async_copy(
                        pos_hbm.at[:, pl.ds(off, q)],
                        pos_buf.at[slot],
                        sem_in.at[slot],
                    ).wait()
                    chunk = pos_buf[slot]
                    gi = off + lax.broadcasted_iota(I32, (1, q), 1)
                    valid = ((gi >= start) & (gi < end)).astype(F32)
                    a_mat, wz_mat = _chunk_weights(
                        scheme, m, w, wy_pad, chunk, yb, valid, q,
                        gplane, drift, zb, zbs, nbz, wz_pad,
                    )
                    win[...] = win[...] + _dot(
                        a_mat, wz_mat, (((1,), (1,)), ((), ())),
                        precision,
                    )
                    return 0

                lax.fori_loop(c0, c1, chunk_body, 0)

            def region_copy(plane, yb, zb, slot, to_hbm: bool):
                window = out_ref.at[
                    pl.ds(plane, wx_eff), pl.ds(yb * YB, wy_pad),
                    pl.ds(zb * zbs, wz_pad),
                ]
                if to_hbm:
                    return pltpu.make_async_copy(
                        region.at[slot], window, sem_wr.at[slot]
                    )
                return pltpu.make_async_copy(
                    window, region.at[slot], sem_rd.at[slot]
                )

            def tile_coords(t):
                zb = lax.rem(t, jnp.int32(nbz))
                tyx = lax.div(t, jnp.int32(nbz))
                yb = lax.rem(tyx, jnp.int32(nby))
                plane = lax.div(tyx, jnp.int32(nby))
                return plane, yb, zb

            if not pipelined:
                def tile_body(t, _):
                    start = starts_ref[t]
                    end = starts_ref[t + 1]
                    plane, yb, zb = tile_coords(t)
                    # global grid plane of this tile (slab offset; the
                    # widened drift windows compare against global bases)
                    gplane = plane + plane0_ref[0]

                    @pl.when(end > start)
                    def _():
                        accumulate(t, yb, zb, gplane, start, end)
                        # read-modify-write the tile's window region
                        # (tiles run strictly serially: no write races)
                        rd = region_copy(plane, yb, zb, 0, False)
                        rd.start()
                        rd.wait()
                        region[0] = region[0] + win[...].reshape(
                            wx_eff, wy_pad, wz_pad
                        )
                        wr = region_copy(plane, yb, zb, 0, True)
                        wr.start()
                        wr.wait()

                    return 0

                lax.fori_loop(jnp.int32(0), jnp.int32(ntiles), tile_body, 0)
                return

            # pipelined phase order; window DMAs run for EVERY visited
            # tile (empty ones skip only the chunk loop) so starts/waits
            # pair up unconditionally
            for a in range(2):
                ny_a = (nby - a + 1) // 2
                for b in range(min(nbz, 2)):
                    nz_b = (nbz - b + 1) // 2
                    size = n_planes * ny_a * nz_b
                    if size == 0:
                        continue

                    def visit_body(v, _, a=a, b=b, ny_a=ny_a, nz_b=nz_b):
                        r = lax.rem(v, jnp.int32(ny_a * nz_b))
                        plane = lax.div(v, jnp.int32(ny_a * nz_b))
                        yb = 2 * lax.div(r, jnp.int32(nz_b)) + a
                        zb = 2 * lax.rem(r, jnp.int32(nz_b)) + b
                        t = (plane * nby + yb) * nbz + zb
                        start = starts_ref[t]
                        end = starts_ref[t + 1]
                        gplane = plane + plane0_ref[0]
                        slot = lax.rem(v, jnp.int32(2))

                        # slot's previous write must land before rereading
                        @pl.when(v >= 2)
                        def _():
                            region_copy(plane, yb, zb, slot, True).wait()

                        rd = region_copy(plane, yb, zb, slot, False)
                        rd.start()

                        @pl.when(end > start)
                        def _():
                            accumulate(t, yb, zb, gplane, start, end)

                        rd.wait()

                        @pl.when(end > start)
                        def _():
                            region[slot] = region[slot] + win[...].reshape(
                                wx_eff, wy_pad, wz_pad
                            )

                        # write-behind: the next visit's window is
                        # disjoint (stride-2 phase order), so no race
                        region_copy(plane, yb, zb, slot, True).start()
                        return 0

                    lax.fori_loop(jnp.int32(0), jnp.int32(size),
                                  visit_body, 0)
                    # drain this phase's trailing writes (regions of the
                    # NEXT phase do overlap this one's)
                    for back in range(min(size, 2)):
                        v_last = size - 1 - back
                        r = v_last % (ny_a * nz_b)
                        plane = v_last // (ny_a * nz_b)
                        yb = 2 * (r // nz_b) + a
                        zb = 2 * (r % nz_b) + b
                        region_copy(
                            jnp.int32(plane), jnp.int32(yb), jnp.int32(zb),
                            jnp.int32(v_last % 2), True
                        ).wait()

        pl.run_scoped(
            run,
            pos_buf=pltpu.VMEM((2, 4, q), F32),
            win=pltpu.VMEM((rows, wz_pad), F32),
            region=pltpu.VMEM((2, wx_eff, wy_pad, wz_pad), F32),
            sem_in=pltpu.SemaphoreType.DMA((2,)),
            sem_rd=pltpu.SemaphoreType.DMA((2,)),
            sem_wr=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def _fold_axis(arr, axis, m, lead: int = 0):
    """Fold pad cells periodically: index i of ``arr`` holds grid index
    (i - lead); the leading ``lead`` cells wrap onto the top, cells
    beyond lead + m wrap onto the bottom."""
    size = arr.shape[axis]
    head = lax.slice_in_dim(arr, lead, lead + m, axis=axis)
    if lead:
        piece = lax.slice_in_dim(arr, 0, lead, axis=axis)
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(m - lead, m)
        head = head.at[tuple(idx)].add(piece)
    off = lead + m
    while off < size:
        hi = min(off + m, size)
        piece = lax.slice_in_dim(arr, off, hi, axis=axis)
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(0, hi - off)
        head = head.at[tuple(idx)].add(piece)
        off = hi
    return head


def deposit_slab(position_sorted, tile_starts, ncells_1d: int, scheme: str,
                 interpret: bool = False, n_planes: int | None = None,
                 drift: int = 0, plane0=None,
                 precision: str = "f32") -> jax.Array:
    """Deposit tile-sorted column particles onto the local x-slab.

    Returns the y-folded, z-trimmed padded slab
    (n_planes + w - 1 + 2*drift, M, M) whose x index i holds grid plane
    (plane0 + i - drift): the leading ``drift`` planes spill onto the
    left neighbour and the trailing w - 1 + drift planes onto the right
    (periodic wrap on a single device -- :func:`deposit` does that fold).
    ``drift`` widens the windows for lazy re-binning (stale tile sort);
    ``plane0`` is this shard's first global plane (device scalar).
    """
    m = ncells_1d
    if n_planes is None:
        n_planes = m
    scheme = scheme.casefold()
    w, wx_eff, wy_pad, rows, wz_pad, nby, ntiles, zbs, nbz = _geometry(
        m, scheme, n_planes, drift
    )
    if plane0 is None:
        plane0 = jnp.zeros((1,), I32)
    else:
        plane0 = jnp.asarray(plane0, I32).reshape(1)

    gp_shape = (n_planes + w - 1 + 2 * drift, m + wy_pad - YB,
                m + wz_pad - zbs)
    zeros = jnp.zeros(gp_shape, F32)
    q = _chunk_q(position_sorted.shape[1], ntiles)
    gp = pl.pallas_call(
        _deposit_kernel(scheme, m, n_planes, drift, precision, q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(gp_shape, F32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(tile_starts, plane0, position_sorted, zeros)
    gp = _fold_axis(gp, 1, m, lead=drift)
    if nbz == 1:
        return gp[:, :, :m]  # z wrap lives in the one-hot; pad is zero
    # z-blocked windows spill like y: fold the pad cells periodically
    # (z index i holds grid z (i - drift))
    return _fold_axis(gp, 2, m, lead=drift)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def deposit(position_sorted, tile_starts, ncells_1d: int, scheme: str,
            interpret: bool = False, drift: int = 0,
            precision: str = "f32") -> jax.Array:
    """Deposit tile-sorted column particles; returns the (M, M, M) counts
    grid (single device: the x spill wraps periodically). ``drift``
    widens the windows for the lazy re-binning mode (stale tile sort)."""
    m = ncells_1d
    scheme = scheme.casefold()
    gp = deposit_slab(position_sorted, tile_starts, m, scheme, interpret,
                      drift=drift, precision=precision)
    # gp x index i holds grid plane (i - drift)
    return _fold_axis(gp, 0, m, lead=drift)


# ---------------------------------------------------------------------------
# Gather
# ---------------------------------------------------------------------------

def _gather_kernel(scheme: str, m: int, ncomp: int, n_planes: int,
                   drift: int = 0, precision: str = "f32", q: int = Q):
    w, wx_eff, wy_pad, rows, wz_pad, nby, ntiles, zbs, nbz = _geometry(
        m, scheme, n_planes, drift
    )

    def kernel(starts_ref, plane0_ref, pos_hbm, fext_hbm, zeros_hbm,
               out_ref):
        del zeros_hbm  # aliased to out_ref (pre-zeroed output)

        def run(pos_buf, cur_buf, fwin, fw_flat, out_buf, sem_in, sem_cur,
                sem_f, sem_out):
            def win_dma(t, slot):
                """Field-window copy for tile t into double-buffer slot.

                Windows are read-only, so tile t+1's fetch can fly while
                tile t contracts -- the per-tile DMA latency (the serial
                floor when tiles are small, e.g. 512^3 z-blocked has 128K
                tiles) hides behind compute. Issued for EVERY tile (even
                empty ones) so starts/waits pair up unconditionally.
                """
                zb = lax.rem(t, jnp.int32(nbz))
                tyx = lax.div(t, jnp.int32(nbz))
                yb = lax.rem(tyx, jnp.int32(nby))
                plane = lax.div(tyx, jnp.int32(nby))
                return pltpu.make_async_copy(
                    fext_hbm.at[
                        :, pl.ds(plane, wx_eff), pl.ds(yb * YB, wy_pad),
                        pl.ds(zb * zbs, wz_pad),
                    ],
                    fwin.at[slot],
                    sem_f.at[slot],
                )

            win_dma(jnp.int32(0), jnp.int32(0)).start()

            def tile_body(t, _):
                start = starts_ref[t]
                end = starts_ref[t + 1]
                fslot = lax.rem(t, jnp.int32(2))

                @pl.when(t + 1 < ntiles)
                def _():
                    win_dma(t + 1, 1 - fslot).start()

                win_dma(t, fslot).wait()

                @pl.when(end > start)
                def _():
                    tyx = lax.div(t, jnp.int32(nbz))
                    yb = lax.rem(tyx, jnp.int32(nby))
                    plane = lax.div(tyx, jnp.int32(nby))
                    zb = lax.rem(t, jnp.int32(nbz))
                    gplane = plane + plane0_ref[0]
                    c0 = lax.div(start, jnp.int32(q))
                    c1 = lax.div(end + jnp.int32(q - 1), jnp.int32(q))

                    def start_dma(c, slot):
                        off = pl.multiple_of(c * q, q)
                        pltpu.make_async_copy(
                            pos_hbm.at[:, pl.ds(off, q)],
                            pos_buf.at[slot],
                            sem_in.at[slot],
                        ).start()
                        # current output content (straddle-chunk merge)
                        pltpu.make_async_copy(
                            out_ref.at[:, pl.ds(off, q)],
                            cur_buf.at[slot],
                            sem_cur.at[slot],
                        ).start()

                    start_dma(c0, lax.rem(c0, jnp.int32(2)))
                    # flatten the window once per tile (doing it per chunk
                    # re-materialises 147 KB through the VPU every 512
                    # particles)
                    fw_flat[...] = fwin[fslot].reshape(ncomp * rows, wz_pad)

                    def chunk_body(c, _):
                        slot = lax.rem(c, jnp.int32(2))
                        # prefetch the next particle chunk during compute
                        @pl.when(c + 1 < c1)
                        def _():
                            start_dma(c + 1, lax.rem(c + 1, jnp.int32(2)))

                        off = pl.multiple_of(c * q, q)
                        pltpu.make_async_copy(
                            pos_hbm.at[:, pl.ds(off, q)],
                            pos_buf.at[slot],
                            sem_in.at[slot],
                        ).wait()
                        chunk = pos_buf[slot]
                        gi = off + lax.broadcasted_iota(I32, (1, q), 1)
                        valid = ((gi >= start) & (gi < end)).astype(F32)
                        a_mat, wz_mat = _chunk_weights(
                            scheme, m, w, wy_pad, chunk, yb,
                            jnp.ones((1, q), F32), q, gplane, drift,
                            zb, zbs, nbz, wz_pad,
                        )
                        # one fused MXU dot over all components:
                        # (C*rows, WZ) x (WZ, P) -> (C*rows, P)
                        t1 = _dot(
                            fw_flat[...], wz_mat, (((1,), (0,)), ((), ())),
                            precision,
                        ).reshape(ncomp, rows, q)
                        vals = jnp.sum(t1 * a_mat[None, :, :], axis=1)
                        vals = jnp.concatenate(
                            [vals, jnp.zeros((4 - ncomp, q), F32)], axis=0
                        )
                        # wait for this slot's previous output write, then
                        # merge with current content and write back
                        @pl.when(c >= c0 + 2)
                        def _():
                            off_prev = pl.multiple_of((c - 2) * q, q)
                            pltpu.make_async_copy(
                                out_buf.at[slot],
                                out_ref.at[:, pl.ds(off_prev, q)],
                                sem_out.at[slot],
                            ).wait()
                        pltpu.make_async_copy(
                            out_ref.at[:, pl.ds(off, q)],
                            cur_buf.at[slot],
                            sem_cur.at[slot],
                        ).wait()
                        out_buf[slot] = jnp.where(
                            valid > 0, vals, cur_buf[slot]
                        )
                        pltpu.make_async_copy(
                            out_buf.at[slot],
                            out_ref.at[:, pl.ds(off, q)],
                            sem_out.at[slot],
                        ).start()
                        return 0

                    lax.fori_loop(c0, c1, chunk_body, 0)

                    # drain the last (up to) two output writes before the
                    # next tile may read the straddling chunk
                    def drain(c, _):
                        slot = lax.rem(c, jnp.int32(2))
                        off_d = pl.multiple_of(c * q, q)
                        pltpu.make_async_copy(
                            out_buf.at[slot],
                            out_ref.at[:, pl.ds(off_d, q)],
                            sem_out.at[slot],
                        ).wait()
                        return 0

                    lax.fori_loop(jnp.maximum(c1 - 2, c0), c1, drain, 0)

                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(ntiles), tile_body, 0)

        pl.run_scoped(
            run,
            pos_buf=pltpu.VMEM((2, 4, q), F32),
            cur_buf=pltpu.VMEM((2, 4, q), F32),
            fwin=pltpu.VMEM((2, ncomp, wx_eff, wy_pad, wz_pad), F32),
            fw_flat=pltpu.VMEM((ncomp * rows, wz_pad), F32),
            out_buf=pltpu.VMEM((2, 4, q), F32),
            sem_in=pltpu.SemaphoreType.DMA((2,)),
            sem_cur=pltpu.SemaphoreType.DMA((2,)),
            sem_f=pltpu.SemaphoreType.DMA((2,)),
            sem_out=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def _extend_z(fc, m: int, wz_pad: int, zbs: int, nbz: int, drift: int):
    """z-extend a component-leading field for the gather windows.

    nbz == 1: zero-pad to wz_pad (the z wrap lives in the one-hot).
    nbz > 1: periodic halo like y -- extended z index j holds grid z
    (j - drift) mod m, so tile zb's window DMA [zb*zbs, zb*zbs + wz_pad)
    covers its (drift-shifted) block plus the wrap cells.
    """
    if nbz == 1:
        if wz_pad > m:
            fc = jnp.pad(
                fc, ((0, 0),) * (fc.ndim - 1) + ((0, wz_pad - m),)
            )
        return fc
    z_parts = []
    if drift:
        z_parts.append(fc[..., m - drift:])
    z_parts.append(fc)
    tail = wz_pad - zbs - drift
    while tail > 0:  # tiny test-only ZB can wrap more than once
        take = min(tail, m)
        z_parts.append(fc[..., :take])
        tail -= take
    return jnp.concatenate(z_parts, axis=-1)


def gather_vec_slab(field_ext, position_sorted, tile_starts, scheme: str,
                    interpret: bool = False, drift: int = 0,
                    plane0=None, precision: str = "f32") -> jax.Array:
    """Interpolate a pre-extended local slab field at tile-sorted column
    particles.

    ``field_ext`` is (n_planes + w - 1 + 2*drift, M, M, C): the local
    slab planes plus ``drift`` left and w - 1 + drift right halo planes
    (extended index i holds grid plane plane0 + i - drift; wrapped on a
    single device, fetched from the neighbours under sharding). Returns
    (4, N_up) values (rows 0..C-1 are the components, the rest zero
    padding) aligned with the sorted columns; tail/never-touched chunks
    come back zero (the output aliases a zeros buffer).
    """
    m = field_ext.shape[1]
    ncomp = field_ext.shape[-1]
    scheme = scheme.casefold()
    w = _WIDTH[scheme]
    n_planes = field_ext.shape[0] - (w - 1 + 2 * drift)
    w, wx_eff, wy_pad, rows, wz_pad, nby, ntiles, zbs, nbz = _geometry(
        m, scheme, n_planes, drift
    )
    npad = position_sorted.shape[1]
    if plane0 is None:
        plane0 = jnp.zeros((1,), I32)
    else:
        plane0 = jnp.asarray(plane0, I32).reshape(1)

    # component-leading extended field: x slot a of local plane p reads
    # extended plane p + a; y rows yb*YB-drift..+wy_pad-1; z extended
    # per _extend_z (one-hot wrap when nbz == 1, periodic halo otherwise)
    fc = jnp.moveaxis(field_ext, -1, 0)
    y_parts = []
    if drift:
        y_parts.append(fc[:, :, m - drift:])
    y_parts.append(fc)
    y_parts.append(fc[:, :, : wy_pad - YB - drift])
    fc = jnp.concatenate(y_parts, axis=2)
    fc = _extend_z(fc, m, wz_pad, zbs, nbz, drift)

    zeros = jnp.zeros((4, npad), F32)
    q = _chunk_q(npad, ntiles)
    out = pl.pallas_call(
        _gather_kernel(scheme, m, ncomp, n_planes, drift, precision, q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, npad), F32),
        input_output_aliases={4: 0},
        interpret=interpret,
    )(tile_starts, plane0, position_sorted, fc, zeros)
    return out


@partial(jax.jit, static_argnums=(3, 4, 5))
def gather_vec(field, position_sorted, tile_starts, scheme: str,
               interpret: bool = False, precision: str = "f32") -> jax.Array:
    """Interpolate an (M, M, M, C) field at tile-sorted column particles
    (single device: the x halo wraps periodically)."""
    w = _WIDTH[scheme.casefold()]
    field_ext = (
        jnp.concatenate([field, field[: w - 1]], axis=0) if w > 1 else field
    )
    return gather_vec_slab(
        field_ext, position_sorted, tile_starts, scheme, interpret,
        precision=precision,
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def gather_vec_cl(field_cl, position_sorted, tile_starts, scheme: str,
                  interpret: bool = False, drift: int = 0,
                  precision: str = "f32") -> jax.Array:
    """Component-leading variant: field (C, M, M, M) -- skips the
    full-field transpose copy that (M, M, M, C) input would need.
    ``drift`` widens the windows for the lazy re-binning mode: the
    extended field gains ``drift`` leading wrap planes/rows in x and y
    (extended index i holds grid index i - drift)."""
    m = field_cl.shape[1]
    ncomp = field_cl.shape[0]
    scheme = scheme.casefold()
    w, wx_eff, wy_pad, rows, wz_pad, nby, ntiles, zbs, nbz = _geometry(
        m, scheme, None, drift
    )
    npad = position_sorted.shape[1]

    fc = field_cl
    if drift or w > 1:
        parts = []
        if drift:
            parts.append(fc[:, m - drift:])
        parts.append(fc)
        if w - 1 + drift:
            parts.append(fc[:, : w - 1 + drift])
        fc = jnp.concatenate(parts, axis=1)
    y_parts = []
    if drift:
        y_parts.append(fc[:, :, m - drift:])
    y_parts.append(fc)
    y_parts.append(fc[:, :, : wy_pad - YB - drift])
    fc = jnp.concatenate(y_parts, axis=2)
    fc = _extend_z(fc, m, wz_pad, zbs, nbz, drift)

    zeros = jnp.zeros((4, npad), F32)
    q = _chunk_q(npad, ntiles)
    out = pl.pallas_call(
        _gather_kernel(scheme, m, ncomp, m, drift, precision, q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, npad), F32),
        input_output_aliases={4: 0},
        interpret=interpret,
    )(tile_starts, jnp.zeros((1,), I32), position_sorted, fc, zeros)
    return out
