"""Mesh <-> particle operators and grid stencils.

TPU-native replacement for the reference's Numba kernels (``mesh.py``).
Mass deposition is a deterministic XLA scatter-add over flattened cell
indices (replacing LLVM ``atomic_rmw`` scatter, ``numpy_atomic.py``);
force interpolation is a gather; stencils are roll-based so they lower to
concatenated slices that XLA fuses and, under shard_map, become halo
exchanges.

Parity map (reference ``mesh.py``):
- ``deposit_ngp/cic/tsc``      <->  NGP (:2240), CIC (:2284), TSC (:2468)
- ``gather_*`` / ``gather_*_vec``  <->  invNGP/invCIC/invTSC[_vec]
  (:2600-3089)
- ``derivative`` 2/3/5/7-point  <->  derivative{2,3,5,7} (:639-851)
- ``derivative_fR``            <->  derivative{2,3,5,7}_fR_n{1,2}
  (:860-2070) -- computed as the stencil of ``a + f * b**(n+1)`` which is
  algebraically identical to the fused forms
- ``restriction`` (:14), ``prolongation`` (:206, trilinear 27-point with
  weights 27/9/3/1 over 64), ``add_prolongation`` (:334)
- ``divergence2`` (:556), ``divergence3`` (:596)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32


def roll(x: jax.Array, shift: int, axis: int) -> jax.Array:
    """Periodic shift; roll(x, -1, 0)[i] == x[i+1]."""
    return jnp.roll(x, shift, axis=axis)


# ---------------------------------------------------------------------------
# Particle <-> mesh
# ---------------------------------------------------------------------------

def _cells_and_offsets(position: jax.Array, ncells_1d: int):
    """Base cell index and offset from the cell centre, per axis.

    Matches the reference convention: ``i = trunc(x * N)``,
    ``d = x*N - 0.5 - i`` in [-0.5, 0.5).
    """
    xs = position * F32(ncells_1d)
    ijk = jnp.clip(xs.astype(I32), 0, ncells_1d - 1)
    d = xs - F32(0.5) - ijk.astype(F32)
    return ijk, d


def _flat(i, j, k, n: int):
    return (i * n + j) * n + k


def deposit_ngp(position: jax.Array, ncells_1d: int) -> jax.Array:
    ijk, _ = _cells_and_offsets(position, ncells_1d)
    flat = _flat(ijk[:, 0], ijk[:, 1], ijk[:, 2], ncells_1d)
    grid = jnp.zeros((ncells_1d ** 3,), F32)
    grid = grid.at[flat].add(F32(1), mode="promise_in_bounds")
    return grid.reshape(ncells_1d, ncells_1d, ncells_1d)


def _cic_axes(position: jax.Array, ncells_1d: int):
    ijk, d = _cells_and_offsets(position, ncells_1d)
    sign = jnp.sign(d).astype(I32)
    absd = jnp.abs(d)
    i2 = (ijk + sign) % ncells_1d
    w1 = F32(1) - absd  # weight at base cell
    w2 = absd  # weight at neighbour cell
    return ijk, i2, w1, w2


def deposit_cic(position: jax.Array, ncells_1d: int) -> jax.Array:
    """Cloud-in-cell deposition; returns particle counts per cell."""
    ijk, i2, w1, w2 = _cic_axes(position, ncells_1d)
    grid = jnp.zeros((ncells_1d ** 3,), F32)
    for bx in range(2):
        ci = i2[:, 0] if bx else ijk[:, 0]
        wi = w2[:, 0] if bx else w1[:, 0]
        for by in range(2):
            cj = i2[:, 1] if by else ijk[:, 1]
            wj = w2[:, 1] if by else w1[:, 1]
            for bz in range(2):
                ck = i2[:, 2] if bz else ijk[:, 2]
                wk = w2[:, 2] if bz else w1[:, 2]
                grid = grid.at[_flat(ci, cj, ck, ncells_1d)].add(
                    wi * wj * wk, mode="promise_in_bounds"
                )
    return grid.reshape(ncells_1d, ncells_1d, ncells_1d)


def _tsc_axes(position: jax.Array, ncells_1d: int):
    ijk, d = _cells_and_offsets(position, ncells_1d)
    half = F32(0.5)
    w0 = F32(0.75) - d * d
    wm = half * (half - d) ** 2
    wp = half * (half + d) ** 2
    im = (ijk - 1) % ncells_1d
    ip = (ijk + 1) % ncells_1d
    cells = (im, ijk, ip)
    weights = (wm, w0, wp)
    return cells, weights


def deposit_tsc(position: jax.Array, ncells_1d: int) -> jax.Array:
    """Triangular-shaped-cloud deposition; 27-point scatter."""
    cells, weights = _tsc_axes(position, ncells_1d)
    grid = jnp.zeros((ncells_1d ** 3,), F32)
    for ax in range(3):
        for ay in range(3):
            for az in range(3):
                w = weights[ax][:, 0] * weights[ay][:, 1] * weights[az][:, 2]
                flat = _flat(
                    cells[ax][:, 0], cells[ay][:, 1], cells[az][:, 2], ncells_1d
                )
                grid = grid.at[flat].add(w, mode="promise_in_bounds")
    return grid.reshape(ncells_1d, ncells_1d, ncells_1d)


def deposit(position: jax.Array, ncells_1d: int, scheme: str) -> jax.Array:
    scheme = scheme.casefold()
    if scheme == "ngp":
        return deposit_ngp(position, ncells_1d)
    if scheme == "cic":
        return deposit_cic(position, ncells_1d)
    if scheme == "tsc":
        return deposit_tsc(position, ncells_1d)
    raise NotImplementedError(f"mass scheme {scheme!r}, should be NGP, CIC or TSC")


def _gather_sum(grid_flat: jax.Array, contribs) -> jax.Array:
    out = None
    for flat, w in contribs:
        vals = grid_flat[flat]
        term = w[..., None] * vals if vals.ndim == 2 else w * vals
        out = term if out is None else out + term
    return out


def _cic_contribs(position, ncells_1d):
    ijk, i2, w1, w2 = _cic_axes(position, ncells_1d)
    contribs = []
    for bx in range(2):
        ci = i2[:, 0] if bx else ijk[:, 0]
        wi = w2[:, 0] if bx else w1[:, 0]
        for by in range(2):
            cj = i2[:, 1] if by else ijk[:, 1]
            wj = w2[:, 1] if by else w1[:, 1]
            for bz in range(2):
                ck = i2[:, 2] if bz else ijk[:, 2]
                wk = w2[:, 2] if bz else w1[:, 2]
                contribs.append(
                    (_flat(ci, cj, ck, ncells_1d), wi * wj * wk)
                )
    return contribs


def _tsc_contribs(position, ncells_1d):
    cells, weights = _tsc_axes(position, ncells_1d)
    contribs = []
    for ax in range(3):
        for ay in range(3):
            for az in range(3):
                w = weights[ax][:, 0] * weights[ay][:, 1] * weights[az][:, 2]
                flat = _flat(
                    cells[ax][:, 0], cells[ay][:, 1], cells[az][:, 2], ncells_1d
                )
                contribs.append((flat, w))
    return contribs


def gather(grid: jax.Array, position: jax.Array, scheme: str) -> jax.Array:
    """Interpolate a scalar grid to particle positions (invNGP/CIC/TSC)."""
    n = grid.shape[0]
    flatg = grid.reshape(-1)
    scheme = scheme.casefold()
    if scheme == "ngp":
        ijk, _ = _cells_and_offsets(position, n)
        return flatg[_flat(ijk[:, 0], ijk[:, 1], ijk[:, 2], n)]
    if scheme == "cic":
        return _gather_sum(flatg, _cic_contribs(position, n))
    if scheme == "tsc":
        return _gather_sum(flatg, _tsc_contribs(position, n))
    raise NotImplementedError(scheme)


def gather_vec(grid: jax.Array, position: jax.Array, scheme: str) -> jax.Array:
    """Interpolate a vector grid (N, N, N, 3) to particles -> (Npart, 3)."""
    n = grid.shape[0]
    flatg = grid.reshape(-1, 3)
    scheme = scheme.casefold()
    if scheme == "ngp":
        ijk, _ = _cells_and_offsets(position, n)
        return flatg[_flat(ijk[:, 0], ijk[:, 1], ijk[:, 2], n)]
    if scheme == "cic":
        return _gather_sum(flatg, _cic_contribs(position, n))
    if scheme == "tsc":
        return _gather_sum(flatg, _tsc_contribs(position, n))
    raise NotImplementedError(scheme)


# ---------------------------------------------------------------------------
# Gradient stencils
# ---------------------------------------------------------------------------

def _axis_diff(a: jax.Array, axis: int, order: int) -> jax.Array:
    n = a.shape[0]
    if order == 2:
        # two-point forward difference (reference derivative2)
        return F32(n) * (roll(a, -1, axis) - a)
    if order == 3:
        return F32(0.5 * n) * (roll(a, -1, axis) - roll(a, 1, axis))
    if order == 5:
        inv12h = F32(n / 12.0)
        return inv12h * (
            F32(8) * (roll(a, -1, axis) - roll(a, 1, axis))
            + roll(a, 2, axis)
            - roll(a, -2, axis)
        )
    if order == 7:
        inv60h = F32(n / 60.0)
        return inv60h * (
            F32(45) * (roll(a, -1, axis) - roll(a, 1, axis))
            + F32(9) * (roll(a, 2, axis) - roll(a, -2, axis))
            - roll(a, 3, axis)
            + roll(a, -3, axis)
        )
    raise NotImplementedError(f"gradient stencil order {order}, should be 2, 3, 5 or 7")


def derivative(a: jax.Array, order: int, leading: bool = False) -> jax.Array:
    """Gradient of a scalar grid -> (N, N, N, 3), or (3, N, N, N) with
    ``leading=True`` (component-leading: what the Pallas gather consumes
    directly, avoiding a full-field transpose copy)."""
    return jnp.stack(
        [_axis_diff(a, ax, order) for ax in range(3)],
        axis=0 if leading else -1,
    )


def derivative_fR(
    a: jax.Array, b: jax.Array, f, fR_n: int, order: int,
    leading: bool = False,
) -> jax.Array:
    """f(R) force mesh: grad(a) + f * grad(b**(fR_n+1)).

    Identical to the reference's fused kernels since the stencil is linear.
    """
    f = F32(f)
    if fR_n == 1:
        combined = a + f * b * b
    elif fR_n == 2:
        combined = a + f * b * b * b
    else:
        raise NotImplementedError(f"fR_n must be 1 or 2, got {fR_n}")
    return derivative(combined, order, leading)


def divergence(a: jax.Array, order: int) -> jax.Array:
    """Divergence of a vector field (N, N, N, 3) -> (N, N, N)."""
    n = a.shape[0]
    if order == 2:
        return F32(n) * (
            (a[..., 0] - roll(a[..., 0], 1, 0))
            + (a[..., 1] - roll(a[..., 1], 1, 1))
            + (a[..., 2] - roll(a[..., 2], 1, 2))
        )
    if order == 3:
        inv2h = F32(0.5 * n)
        return inv2h * (
            (roll(a[..., 0], -1, 0) - roll(a[..., 0], 1, 0))
            + (roll(a[..., 1], -1, 1) - roll(a[..., 1], 1, 1))
            + (roll(a[..., 2], -1, 2) - roll(a[..., 2], 1, 2))
        )
    raise NotImplementedError(order)


# ---------------------------------------------------------------------------
# Multigrid transfer operators
# ---------------------------------------------------------------------------

def restriction(x: jax.Array) -> jax.Array:
    """Full-weighting restriction: mean over 2x2x2 children.

    reduce_window instead of a reshape to (n,2,n,2,n,2): TPU layouts tile
    the two minor dims to (8, 128), so the reshape would physically pad
    each size-2 dim (32 GB of HBM for one 512^3 restriction).
    """
    return jax.lax.reduce_window(
        x, F32(0), jax.lax.add, (2, 2, 2), (2, 2, 2), "VALID"
    ) * F32(0.125)


def minus_restriction(x: jax.Array) -> jax.Array:
    return -restriction(x)


def _prolong_axis(x: jax.Array, axis: int) -> jax.Array:
    """Double the size along `axis` with (3/4, 1/4) trilinear weights.

    The even/odd interleave uses interior lax.pad instead of a
    stack+reshape: a trailing size-2 dim would be physically padded to
    the (8, 128) TPU tile (64x memory blowup on the minor axis).
    """
    c = F32(0.75) * x
    even = c + F32(0.25) * roll(x, 1, axis)
    odd = c + F32(0.25) * roll(x, -1, axis)
    cfg_even = [(0, 0, 0)] * x.ndim
    cfg_even[axis] = (0, 1, 1)  # values at 0, 2, 4, ...
    cfg_odd = [(0, 0, 0)] * x.ndim
    cfg_odd[axis] = (1, 0, 1)  # values at 1, 3, 5, ...
    zero = F32(0)
    return jax.lax.pad(even, zero, cfg_even) + jax.lax.pad(
        odd, zero, cfg_odd
    )


def prolongation(x: jax.Array) -> jax.Array:
    """Trilinear prolongation (27-point, weights 27/9/3/1 over 64)."""
    for axis in range(3):
        x = _prolong_axis(x, axis)
    return x


def add_prolongation(y: jax.Array, x: jax.Array) -> jax.Array:
    from . import pallas_stencil as ps

    if ps.use_pallas_full(y.shape[0]):
        return ps.add_prolongation(y, x)
    return y + prolongation(x)


# ---------------------------------------------------------------------------
# Particle utilities
# ---------------------------------------------------------------------------

_WRAP_EPS = -(0.5 ** 25) * (1.0 + 1e-6)


def periodic_wrap(position: jax.Array) -> jax.Array:
    """Wrap positions into [0, 1), snapping float32-epsilon negatives to 0.

    Same semantics as the reference (utils.py:1119-1149). Values >= 1.5
    are preserved: the pallas engine's column state marks its alignment
    tail with a sentinel position of 2.0 (ops/pallas_pm.py) which must
    survive the wrap (real positions never reach 1.5 -- the per-step CFL
    bounds drift to a fraction of a cell).
    """
    eps = F32(_WRAP_EPS)
    x = position
    x = jnp.where((x < 0) & (x > eps), F32(0), x)
    x = jnp.where(x < 0, x + F32(1), x)
    x = jnp.where((x >= 1) & (x < F32(1.5)), x - F32(1), x)
    return x


def _spread_bits_21(v: jax.Array) -> jax.Array:
    """Spread the low 21 bits of v so they occupy every third bit."""
    x = v.astype(jnp.uint64) & jnp.uint64(0x1FFFFF)
    x = (x | (x << 32)) & jnp.uint64(0x1F00000000FFFF)
    x = (x | (x << 16)) & jnp.uint64(0x1F0000FF0000FF)
    x = (x | (x << 8)) & jnp.uint64(0x100F00F00F00F00F)
    x = (x | (x << 4)) & jnp.uint64(0x10C30C30C30C30C3)
    x = (x | (x << 2)) & jnp.uint64(0x1249249249249249)
    return x


def morton_keys(position: jax.Array) -> jax.Array:
    """64-bit Morton keys at 21 bits per axis (reference: morton.py:41-109)."""
    scaled = jnp.clip(
        (position.astype(F32) * F32(2.0 ** 21)).astype(jnp.uint32),
        0,
        jnp.uint32(2 ** 21 - 1),
    )
    return (
        (_spread_bits_21(scaled[:, 0]) << 2)
        | (_spread_bits_21(scaled[:, 1]) << 1)
        | _spread_bits_21(scaled[:, 2])
    )


@jax.jit
def reorder_particles(position: jax.Array, *arrays):
    """Globally sort particles by Morton key for deposition locality.

    The reference only chunk-sorts per thread (utils.py:1019-1116); a full
    device sort is cheap on TPU and gives strictly better locality.
    """
    keys = morton_keys(position)
    order = jnp.argsort(keys)
    out = [position[order]]
    out.extend(a[order] for a in arrays)
    return tuple(out)
