"""Slab-decomposed SPMD PM step: grids AND particles sharded over ICI.

The scaling mode of the framework (the reference is single-node with no
domain decomposition at all, README.md:49; this module is the genuinely
new axis). The 3D mesh is sharded in x-slabs of ``M / D`` planes over a
1-D device mesh; each device owns the particles whose mass-assignment
base plane falls in its slab, runs the Pallas tile engine on its local
slab, and the field solve is a distributed pencil FFT:

- deposit: local tile-binned Pallas deposit -> the w-1 rightward spill
  planes travel to the next slab with one ``ppermute`` (the slab analogue
  of the single-device periodic fold);
- Poisson: rfft over the local (y, z) axes, one ``all_to_all`` transpose
  so x becomes local, fft over x, the k-space kernel with slab-offset
  wavenumbers, and the inverse chain back -- XLA routes the all-to-alls
  over ICI;
- force: 5-point gradient with a 2-plane ``ppermute`` halo exchange in x
  (y/z are local rolls);
- gather: local Pallas gather from the slab extended by the w-1 halo
  planes of the right neighbour;
- particle migration: after the drift, particles whose base plane moved
  into a neighbouring slab (the CFL bound keeps it to +-1 plane per step)
  are packed into fixed-capacity buffers and exchanged with two
  ``ppermute``s; arrivals are concatenated ahead of the local tile sort,
  which re-integrates them (and pushes sentinels past the end, so the
  post-sort truncation back to the static per-shard capacity only ever
  drops empty slots -- a nonzero ``lost`` diagnostic flags capacity
  overflow).

Per-device memory and solve time scale with 1/D for every term: particle
state, grids, FFT, stencils, transfer kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..integrate import StepDiagnostics
from ..ops import pallas_pm
from ..ops.dense_pm import _WIDTH, _base_axis
from ..solver import DynScalars, SolverConfig
from ..solver import widened_precisions as solver_mod_widened

F32 = jnp.float32
I32 = jnp.int32
C64 = jnp.complex64

AXIS = "dp"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(devices, axis_names=(AXIS,))


# ---------------------------------------------------------------------------
# Distributed pencil FFT + slab k-space kernels
# ---------------------------------------------------------------------------

def rfft3_slab(x_local: jax.Array, n_dev: int) -> jax.Array:
    """rfftn of an x-slab-sharded real grid.

    In: (P, M, M) local slab. Out: (M, M/D, M/2+1) local pencil --
    x fully local, y sharded. One all-to-all over ICI does the transpose.
    """
    xk = jnp.fft.rfft(x_local.astype(F32), axis=2).astype(C64)
    xk = jnp.fft.fft(xk, axis=1)
    xk = lax.all_to_all(xk, AXIS, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(xk, axis=0)


def irfft3_slab(xk: jax.Array, m: int) -> jax.Array:
    """Inverse of :func:`rfft3_slab`: (M, M/D, M/2+1) -> (P, M, M)."""
    xk = jnp.fft.ifft(xk, axis=0)
    xk = lax.all_to_all(xk, AXIS, split_axis=0, concat_axis=1, tiled=True)
    xk = jnp.fft.ifft(xk, axis=1)
    return jnp.fft.irfft(xk, n=m, axis=2).astype(F32)


def _wavenumbers_slab(m: int, ny_local: int):
    """Integer wavenumbers for the (M, M/D, M/2+1) pencil layout; the y
    axis is offset by this device's slab position."""
    r = lax.axis_index(AXIS)
    k_full = (jnp.arange(m, dtype=I32) + m // 2) % m - m // 2
    kx = k_full.astype(F32)[:, None, None]
    y_ids = r * ny_local + jnp.arange(ny_local, dtype=I32)
    ky = (((y_ids + m // 2) % m - m // 2).astype(F32))[None, :, None]
    kz = jnp.arange(m // 2 + 1, dtype=I32).astype(F32)[None, None, :]
    return kx, ky, kz


def inverse_laplacian_slab(xk: jax.Array, m: int, p: int) -> jax.Array:
    """-1/(4 pi^2 k^2) with optional Jing sinc^-2p MAS compensation, on the
    pencil layout (DC mode zeroed on whichever shard holds it)."""
    kx, ky, kz = _wavenumbers_slab(m, xk.shape[1])
    k2 = kx * kx + ky * ky + kz * kz
    dc = (kx == 0) & (ky == 0) & (kz == 0)
    k2 = jnp.where(dc, F32(1), k2)
    ratio = F32(-0.25 / jnp.pi ** 2) / k2
    if p:
        h = F32(1.0 / m)
        w = jnp.sinc(kx * h) * jnp.sinc(ky * h) * jnp.sinc(kz * h)
        ratio = ratio * w ** (-2 * p)
    return jnp.where(dc, jnp.complex64(0), xk * ratio)


def inverse_laplacian_7pt_slab(xk: jax.Array, m: int) -> jax.Array:
    """Exact inverse of the discrete 7-point Laplacian (pencil layout)."""
    kx, ky, kz = _wavenumbers_slab(m, xk.shape[1])
    pi_h = F32(jnp.pi / m)
    f = (
        jnp.sin(pi_h * kx) ** 2
        + jnp.sin(pi_h * ky) ** 2
        + jnp.sin(pi_h * kz) ** 2
    )
    dc = (kx == 0) & (ky == 0) & (kz == 0)
    f = jnp.where(dc, F32(1), f)
    h2 = F32(1.0 / (m * m))
    return jnp.where(dc, jnp.complex64(0), xk * (F32(-0.25) * h2 / f))


def power_spectrum_slab(xk: jax.Array, m: int, p: int):
    """Binned P(k) on the pencil layout; bin sums are psum'd over shards.
    Same estimator as fourier.power_spectrum (reference fourier.py:22-100).
    """
    kx, ky, kz = _wavenumbers_slab(m, xk.shape[1])
    k_norm = jnp.sqrt(kx * kx + ky * ky + kz * kz)
    k_index = (k_norm + F32(0.5)).astype(I32)
    if p != 0:
        h = F32(1.0 / m)
        w = jnp.sinc(kx * h) * jnp.sinc(ky * h) * jnp.sinc(kz * h)
        amp = xk * w ** (-p)
    else:
        amp = xk
    delta2 = amp.real ** 2 + amp.imag ** 2
    dc = (kx == 0) & (ky == 0) & (kz == 0)
    delta2 = jnp.where(dc, F32(0), delta2)
    weight = jnp.where(dc, F32(0), jnp.ones_like(delta2))
    idx = k_index.ravel()
    nmodes = jnp.zeros((m,), F32).at[idx].add(weight.ravel())
    ksum = jnp.zeros((m,), F32).at[idx].add((k_norm * weight).ravel())
    pksum = jnp.zeros((m,), F32).at[idx].add(delta2.ravel())
    nmodes = lax.psum(nmodes, AXIS)
    ksum = lax.psum(ksum, AXIS)
    pksum = lax.psum(pksum, AXIS)
    kmax = int(2 * (m // 2) / 3)
    sl = slice(1, kmax)
    safe = jnp.maximum(nmodes[sl], F32(1))
    return ksum[sl] / safe, pksum[sl] / safe, nmodes[sl]


# ---------------------------------------------------------------------------
# Halo exchange + slab stencils
# ---------------------------------------------------------------------------

def _perm_fwd(n_dev: int):
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


def _perm_bwd(n_dev: int):
    return [(i, (i - 1) % n_dev) for i in range(n_dev)]


def exchange_halo_x(f_local: jax.Array, h: int, n_dev: int) -> jax.Array:
    """(P, M, M[, C]) -> (P + 2h, ...): h wrapped planes from each side."""
    from_left = lax.ppermute(f_local[-h:], AXIS, _perm_fwd(n_dev))
    from_right = lax.ppermute(f_local[:h], AXIS, _perm_bwd(n_dev))
    return jnp.concatenate([from_left, f_local, from_right], axis=0)


def halo_right(f_local: jax.Array, h: int, n_dev: int) -> jax.Array:
    """(P, ...) -> (P + h, ...): h planes fetched from the right neighbour."""
    return halo_lr(f_local, 0, h, n_dev)


def halo_lr(f_local: jax.Array, h_l: int, h_r: int, n_dev: int) -> jax.Array:
    """(P, ...) -> (h_l + P + h_r, ...): asymmetric halo fetch (the lazy
    drift windows need ``drift`` wrapped planes on the left and
    w - 1 + drift on the right)."""
    parts = []
    if h_l:
        parts.append(lax.ppermute(f_local[-h_l:], AXIS, _perm_fwd(n_dev)))
    parts.append(f_local)
    if h_r:
        parts.append(lax.ppermute(f_local[:h_r], AXIS, _perm_bwd(n_dev)))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else f_local


def add_spill(gp: jax.Array, n_planes: int, n_dev: int,
              lead: int = 0) -> jax.Array:
    """Fold a deposit slab's spill planes onto the neighbouring shards.

    ``gp`` is (lead + n_planes + s, M, M) with x index i holding grid
    plane (plane0 + i - lead): the leading ``lead`` planes belong to the
    left neighbour's last planes (lazy drift windows), the trailing s to
    the right neighbour's first planes. With n_dev == 1 the ppermutes
    are identities, i.e. the single-device periodic fold.
    """
    body = gp[lead:lead + n_planes]
    s = gp.shape[0] - n_planes - lead
    if s:
        spill_r = lax.ppermute(gp[lead + n_planes:], AXIS, _perm_fwd(n_dev))
        body = body.at[:s].add(spill_r)
    if lead:
        spill_l = lax.ppermute(gp[:lead], AXIS, _perm_bwd(n_dev))
        body = body.at[n_planes - lead:].add(spill_l)
    return body


def add_spill_right(gp: jax.Array, n_planes: int, n_dev: int) -> jax.Array:
    return add_spill(gp, n_planes, n_dev, 0)


def derivative_slab(phi_local: jax.Array, order: int, n_dev: int) -> jax.Array:
    """Gradient stencil on an x-slab (same maths as mesh.derivative;
    reference mesh.py:639-851): x via halo-exchanged slices, y/z via rolls.
    """
    m = phi_local.shape[1]
    h = {2: 1, 3: 1, 5: 2, 7: 3}[order]
    ext = exchange_halo_x(phi_local, h, n_dev)  # (P + 2h, M, M)
    p = phi_local.shape[0]

    def sx(shift):  # ext plane slice displaced by `shift` cells
        return lax.dynamic_slice_in_dim(ext, h + shift, p, axis=0)

    def sy(shift):
        return jnp.roll(phi_local, -shift, axis=1)

    def sz(shift):
        return jnp.roll(phi_local, -shift, axis=2)

    comps = []
    for sfn in (sx, sy, sz):
        if order == 2:
            # two-point forward difference (reference derivative2)
            d = F32(m) * (sfn(1) - sfn(0))
        elif order == 3:
            d = F32(0.5 * m) * (sfn(1) - sfn(-1))
        elif order == 5:
            d = F32(m / 12.0) * (
                F32(8) * (sfn(1) - sfn(-1)) + (sfn(-2) - sfn(2))
            )
        elif order == 7:
            d = F32(m / 60.0) * (
                F32(45) * (sfn(1) - sfn(-1))
                + F32(9) * (sfn(-2) - sfn(2))
                + (sfn(3) - sfn(-3))
            )
        else:
            raise NotImplementedError(f"gradient order {order}")
        comps.append(d)
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------------
# Particle migration
# ---------------------------------------------------------------------------

def migrate(pos, vel, m: int, planes_per_shard: int, cap: int, n_dev: int,
            scheme: str):
    """Exchange particles whose base plane left the local slab.

    The CFL drift bound keeps migration to adjacent slabs (one plane per
    step); anything farther is counted in ``lost`` (and dropped), which a
    healthy run never triggers. Returns (pos, vel, lost) with
    2*cap extra columns appended (arrivals; unused slots are sentinels).
    """
    r = lax.axis_index(AXIS)
    px = _base_axis(scheme, pos[0] * F32(m)) % m
    dest = px // planes_per_shard
    is_real = pos[0] < F32(pallas_pm.SENTINEL_MIN)
    if n_dev == 1:
        # dest == r always (one slab owns every plane): nothing can
        # migrate, and routing through the 2-ppermute path would deliver
        # each "leaver" twice ((r+1)%1 == (r-1)%1 == r).
        return pos, vel, jnp.int32(0)
    go_right = is_real & (dest == (r + 1) % n_dev)
    if n_dev == 2:
        # both neighbours are the same device ((r+1)%2 == (r-1)%2), so a
        # dest-based right/left mask pair would select the SAME particles
        # and deliver each one twice. Split leavers disjointly by which
        # edge they crossed instead (signed plane distance from the slab
        # base): right-edge crossers ride the right buffer, wrapped
        # left-edge crossers the left one. Both land on the single
        # neighbour exactly once AND each direction keeps its own
        # cap-sized buffer (routing everything rightward would halve the
        # effective migration capacity and trip the overflow abort on
        # runs that fit).
        leaver = is_real & (dest != r)
        d_planes = (px - r * planes_per_shard) % m
        go_right = leaver & (d_planes < 3 * planes_per_shard // 2)
        go_left = leaver & ~go_right
    else:
        go_left = is_real & (dest == (r - 1) % n_dev)
    stays = is_real & (dest == r)
    lost = jnp.sum(is_real & ~go_right & ~go_left & ~stays) + (
        jnp.maximum(jnp.sum(go_right) - cap, 0)
        + jnp.maximum(jnp.sum(go_left) - cap, 0)
    )

    ncols = pos.shape[1]

    def pack(mask):
        idx = jnp.nonzero(mask, size=cap, fill_value=ncols)[0]
        p = jnp.take(pos, idx, axis=1, mode="fill",
                     fill_value=float(pallas_pm.SENTINEL))
        v = jnp.take(vel, idx, axis=1, mode="fill", fill_value=0.0)
        return p, v

    send_r = pack(go_right)
    send_l = pack(go_left)
    # evacuated slots become sentinels
    leaving = (go_right | go_left)[None, :]
    pos = jnp.where(leaving, F32(pallas_pm.SENTINEL), pos)
    pos = pos.at[3].set(F32(0))
    vel = jnp.where(leaving, F32(0), vel)

    recv_from_left = [lax.ppermute(a, AXIS, _perm_fwd(n_dev)) for a in send_r]
    recv_from_right = [lax.ppermute(a, AXIS, _perm_bwd(n_dev)) for a in send_l]
    pos = jnp.concatenate([pos, recv_from_left[0], recv_from_right[0]],
                          axis=1)
    vel = jnp.concatenate([vel, recv_from_left[1], recv_from_right[1]],
                          axis=1)
    return pos, vel, lost


# ---------------------------------------------------------------------------
# The sharded step
# ---------------------------------------------------------------------------

def shard_capacity(npart: int, n_dev: int, slack: float = 1.25) -> int:
    """Static per-shard particle capacity (slabs are not perfectly
    balanced once structure forms; overflow is detected, not silent)."""
    return pallas_pm.padded_cols(int(npart / n_dev * slack))


def migration_capacity(npart: int, ncells_1d: int, n_dev: int) -> int:
    """Per-direction migration buffer: ~4 mean plane populations."""
    return pallas_pm.padded_cols(max(1024, 4 * npart // (ncells_1d or 1)))


def grow_capacity(mesh: Mesh, cap_new: int):
    """Jitted on-device capacity growth for the sharded column state.

    Re-balancing triggers only on sorted steps, when every particle
    already sits on the shard that owns its plane with columns
    [0, count) real (tile-sorted) and [count, cap) sentinels -- so
    growing the per-shard buffer from cap to ``cap_new`` is pure local
    padding: sentinel columns appended past every tile range. No host
    round-trip (a gather + re-upload is ~4.3 GB over the ~15 MB/s axon
    tunnel at 512^3), no collectives, and ``tile_starts`` stays valid
    unchanged. Returns a function (pos, vel, acc) -> (pos, vel, acc)
    at the new global shape (4, n_dev * cap_new)."""

    def pad(pos, vel, acc):
        k = cap_new - pos.shape[1]
        sent = jnp.full((4, k), F32(pallas_pm.SENTINEL))
        sent = sent.at[3].set(F32(0))
        zero = jnp.zeros((4, k), F32)
        return (jnp.concatenate([pos, sent], axis=1),
                jnp.concatenate([vel, zero], axis=1),
                jnp.concatenate([acc, zero], axis=1))

    spec = (P(None, AXIS),) * 3
    return jax.jit(shard_map(pad, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False))


def mond_rhs_slab(phi_local, g0, mond_function: str, alpha, n_dev: int):
    """QUMOND source on the slab: 2-plane halo exchange, then the
    single-device roll kernel on the extended slab (the x rolls only
    corrupt the trimmed halo planes; every access chain stays within
    offset +-2)."""
    from ..models import mond

    ext = exchange_halo_x(phi_local, 2, n_dev)
    return mond.rhs(ext, g0, mond_function, alpha)[2:-2]


def derivative_fR_slab(phi_local, u_local, f, fR_n: int, order: int,
                       n_dev: int):
    """f(R) force mesh on the slab: grad(phi + f * u^(fR_n+1))."""
    f = F32(f)
    if fR_n == 1:
        combined = phi_local + f * u_local * u_local
    elif fR_n == 2:
        combined = phi_local + f * u_local * u_local * u_local
    else:
        raise NotImplementedError(f"fR_n must be 1 or 2, got {fR_n}")
    return derivative_slab(combined, order, n_dev)


def gradient_inverse_laplacian_slab(xk: jax.Array, m: int, p: int,
                                    n_dev: int) -> jax.Array:
    """full_fft force kernel on the pencil layout: -i k_n/(2 pi k^2) x
    with optional MAS compensation; returns the real-space force slab
    (P, M, M, 3) via three inverse pencil FFTs (fourier.py:606-729)."""
    kx, ky, kz = _wavenumbers_slab(m, xk.shape[1])
    k2 = kx * kx + ky * ky + kz * kz
    dc = (kx == 0) & (ky == 0) & (kz == 0)
    k2 = jnp.where(dc, F32(1), k2)
    ratio = F32(0.5 / jnp.pi) / k2
    if p:
        h = F32(1.0 / m)
        w = jnp.sinc(kx * h) * jnp.sinc(ky * h) * jnp.sinc(kz * h)
        ratio = ratio * w ** (-2 * p)
    tmp = jnp.where(dc, jnp.complex64(0), jnp.complex64(-1j) * ratio * xk)
    comps = [irfft3_slab(tmp * kk, m) for kk in (kx, ky, kz)]
    return jnp.stack(comps, axis=-1)


def _linear_solve_slab(cfg: SolverConfig, rhs, phi, dyn, m: int, n_dev: int,
                       first_call: bool):
    """Poisson solve dispatch on the slab (solver._linear_solve)."""
    from ..models import laplacian as lap
    from . import slab_mg

    solver = cfg.linear_newton_solver
    if solver == "multigrid":
        if first_call:
            phi = lap.initialise_potential(rhs)
        else:
            phi = phi * dyn.potential_scaling
        tolerance = dyn.epsrel * slab_mg.truncation_error_slab(phi, n_dev)
        return slab_mg.linear_slab(
            phi, rhs, cfg.ncoarse, cfg.Npre, cfg.Npost, tolerance, n_dev,
            cfg.multigrid_cycle,
        )
    rhs_k = rfft3_slab(rhs, n_dev)
    if solver == "fft_7pt":
        phi_k = inverse_laplacian_7pt_slab(rhs_k, m)
    elif solver == "fft":
        phi_k = inverse_laplacian_slab(rhs_k, m, cfg.mas_index)
    else:
        raise NotImplementedError(
            f"slab mode linear_newton_solver {solver!r} (multigrid, fft "
            "or fft_7pt)"
        )
    return irfft3_slab(phi_k, m)


def _solve_slab(cfg: SolverConfig, density, phi, u, dyn: DynScalars, m: int,
                n_dev: int, save_pk: bool, first_call: bool):
    """Full field solve on the slab, mirroring solver._solve_fields:
    optional P(k), additional field (f(R) FAS / MOND Newtonian potential),
    Poisson solve, force mesh. All four theories."""
    from ..models import cubic, laplacian as lap, quartic
    from . import slab_mg

    pk = None
    if save_pk:
        pk = power_spectrum_slab(
            rfft3_slab(density, n_dev), m, cfg.mas_index
        )

    theory = cfg.theory
    f1 = F32(1.5) * dyn.aexp * dyn.om_m * dyn.mu_z
    if theory == "fr":
        dens_term = dyn.fR_f1 * density + dyn.fR_f2
        exact = cfg.fR_root_solver == "exact"
        if cfg.fR_n == 1:
            ops = slab_mg.fas_ops_cubic_slab(dyn.fR_q, n_dev, exact)
            if first_call:
                u = cubic.initialise_potential(dens_term, dyn.fR_q)
        else:
            ops = slab_mg.fas_ops_quartic_slab(dyn.fR_q, n_dev, exact)
            if first_call:
                u = quartic.initialise_potential(dens_term, dyn.fR_q)
        tolerance = dyn.epsrel * ops.truncation_error(u, dens_term)
        u = slab_mg.FAS_slab(
            u, dens_term, ops, cfg.ncoarse, cfg.Npre, cfg.Npost,
            tolerance, n_dev, cfg.multigrid_cycle,
        )
    elif theory == "mond":
        rhs_newton = f1 * (density - F32(1))
        if cfg.linear_newton_solver == "multigrid":
            if first_call:
                u = lap.initialise_potential(rhs_newton)
            tolerance = dyn.epsrel * slab_mg.truncation_error_slab(u, n_dev)
            u = slab_mg.linear_slab(
                u, rhs_newton, cfg.ncoarse, cfg.Npre, cfg.Npost,
                tolerance, n_dev, cfg.multigrid_cycle,
            )
        else:  # fft_7pt (reference parity: MOND inner solve is discrete)
            u = irfft3_slab(
                inverse_laplacian_7pt_slab(
                    rfft3_slab(rhs_newton, n_dev), m
                ),
                m,
            )

    if theory == "mond":
        rhs = mond_rhs_slab(u, dyn.mond_g0, cfg.mond_function,
                            cfg.mond_alpha, n_dev)
    else:
        rhs = f1 * (density - F32(1))

    if cfg.linear_newton_solver == "full_fft":
        # solve and differentiate entirely in k-space (solver.py:526-579)
        force = gradient_inverse_laplacian_slab(
            rfft3_slab(rhs, n_dev), m, cfg.mas_index, n_dev
        )
        if theory == "fr":
            force = force + derivative_fR_slab(
                jnp.zeros_like(rhs), u, dyn.fR_half_c2, cfg.fR_n,
                cfg.gradient_stencil_order, n_dev,
            )
        return force, phi, u, pk

    phi = _linear_solve_slab(cfg, rhs, phi, dyn, m, n_dev, first_call)
    if theory == "fr":
        force = derivative_fR_slab(
            phi, u, dyn.fR_half_c2, cfg.fR_n, cfg.gradient_stencil_order,
            n_dev,
        )
    else:
        force = derivative_slab(phi, cfg.gradient_stencil_order, n_dev)
    return force, phi, u, pk


def make_slab_step(cfg: SolverConfig, mesh: Mesh, integrator: str = "leapfrog",
                   save_pk: bool = False, first_call: bool = False,
                   presorted: int = 0, donate: bool = False):
    """Build the jitted slab-sharded KDK step.

    State per shard: pos/vel column arrays (4, C) with sentinel empties,
    acceleration (4, C), potential slab (M/D, M, M), additional-field
    slab (f(R) scalaron / MOND Newtonian potential; token otherwise),
    and the local tile starts. Returns
    ``fn(pos, vel, acc, phi, u, tstarts, dyn, dt) ->
    (pos, vel, acc, phi, u, tstarts, pk, diag)``. All four theories;
    fft / fft_7pt pencil solves or the slab-sharded multigrid
    (parallel/slab_mg.py). ``first_call=True`` builds the variant that
    (re)initialises the potential/scalaron from scratch -- use it for
    the initial force evaluation (a zero-dt step).

    ``presorted = k >= 1`` is the slab analogue of the single-chip lazy
    re-binning step: migration AND the tile sort are skipped; particles
    are processed in their stale bins through k-cell drift-widened
    kernels, the deposit spills up to ``drift`` planes onto BOTH
    neighbours and the gather fetches the matching asymmetric halo, so a
    < k-cell-stale binning (the caller's CFL drift bound) stays exact
    even across slab boundaries. A device-side violation counter feeds
    ``overflow``.
    """
    n_dev = mesh.devices.size
    m = cfg.ncells_1d
    planes = m // n_dev
    drift = int(presorted)
    w = _WIDTH[cfg.mass_scheme]
    if planes * n_dev != m or planes < w - 1 + drift:
        raise ValueError(
            f"ncells_1d={m} must be divisible by n_devices={n_dev} with "
            "slabs at least as tall as the (drift-widened) deposit window"
        )
    cap_mig = migration_capacity(cfg.npart, m, n_dev)
    norm = F32(m ** 3 / cfg.npart)
    interpret = jax.default_backend() == "cpu"

    dyn_specs = jax.tree.map(lambda _: P(), DynScalars(*[0.0] * 10))
    pspec = P(None, AXIS)  # particle columns sharded
    fspec = P(AXIS)  # fields x-slab sharded
    tspec = P(AXIS)  # per-shard tile starts

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec, pspec, pspec, fspec, fspec, tspec, dyn_specs, P()),
        out_specs=(
            pspec, pspec, pspec, fspec, fspec, tspec,
            (P(), P(), P()) if save_pk else P(),
            StepDiagnostics(P(), P(), P(), P()),
        ),
        check_vma=False,
    )
    def step_shard(position, velocity, acceleration, phi, u, tstarts,
                   dyn, dt):
        r = lax.axis_index(AXIS)
        plane0 = (r * planes).astype(I32)
        dt = F32(dt)
        cap = position.shape[1]
        from ..ops import mesh as mesh_ops

        if integrator == "leapfrog":
            half_dt = F32(0.5) * dt
            velocity = velocity - acceleration * half_dt
            position = mesh_ops.periodic_wrap(position + velocity * dt)
        elif integrator == "euler":
            position = mesh_ops.periodic_wrap(position + velocity * dt)
            velocity = velocity - acceleration * dt
        else:
            raise NotImplementedError(integrator)

        if presorted:
            # stale bins stay; detect any particle outside the widened
            # windows (a violated CFL drift bound) instead of trusting it
            overflow = pallas_pm.drift_violations(
                position, tstarts, m, cfg.mass_scheme, drift, plane0,
                planes,
            )
        else:
            # migration + local tile sort (arrivals ride along; sentinels
            # and foreign stragglers sort past the end and are truncated)
            position, velocity, lost = migrate(
                position, velocity, m, planes, cap_mig, n_dev,
                cfg.mass_scheme,
            )
            position, velocity, tstarts = pallas_pm.sort_particles(
                position, velocity, m, cfg.mass_scheme, plane0, planes,
                mode=cfg.sort_mode,
            )
            n_real = tstarts[-1]
            overflow = lost + jnp.maximum(n_real - cap, 0)
            position = position[:, :cap]
            velocity = velocity[:, :cap]

        prec_dep, prec_gat = solver_mod_widened(cfg, drift)
        gp = pallas_pm.deposit_slab(
            position, tstarts, m, cfg.mass_scheme, interpret, planes,
            drift, plane0, precision=prec_dep,
        )
        density = add_spill(gp, planes, n_dev, lead=drift) * norm

        force, phi, u, pk = _solve_slab(
            cfg, density, phi, u, dyn, m, n_dev, save_pk, first_call
        )

        h_l, h_r = drift, w - 1 + drift
        f_ext = halo_lr(force, h_l, h_r, n_dev) if (h_l or h_r) else force
        acceleration = pallas_pm.gather_vec_slab(
            f_ext, position, tstarts, cfg.mass_scheme, interpret, drift,
            plane0, precision=prec_gat,
        )

        if integrator == "leapfrog":
            velocity = velocity - acceleration * half_dt

        diag = StepDiagnostics(
            max_abs_acc=lax.pmax(jnp.max(jnp.abs(acceleration)), AXIS),
            max_abs_vel=lax.pmax(jnp.max(jnp.abs(velocity)), AXIS),
            mean_additional=lax.pmean(jnp.mean(u), AXIS),
            overflow=lax.psum(overflow.astype(jnp.int32), AXIS),
        )
        if not save_pk:
            pk = F32(0)
        return position, velocity, acceleration, phi, u, tstarts, pk, diag

    # donation matters only when one device holds (nearly) the whole
    # problem -- the D=1 distribution-overhead bench at 512^3 (bench.py
    # bench_dist_d1) does not fit HBM with double-buffered state. The
    # production loop keeps the default: _run_slab re-uses the previous
    # state for rebalance decisions after the step returns.
    if donate:
        return jax.jit(step_shard, donate_argnums=(0, 1, 2, 3, 4, 5))
    return jax.jit(step_shard)


def distribute_particles(mesh: Mesh, cfg: SolverConfig, position, velocity,
                         slack: float = 1.25):
    """Host-side initial distribution: rows (npart, 3) -> per-shard column
    state stacked as global (4, D*C) arrays sharded on the column axis."""
    import numpy as np

    n_dev = mesh.devices.size
    m = cfg.ncells_1d
    planes = m // n_dev
    cap = shard_capacity(cfg.npart, n_dev, slack)
    position = np.asarray(position, np.float32)
    velocity = np.asarray(velocity, np.float32)
    xs = position[:, 0] * np.float32(m)
    if cfg.mass_scheme == "cic":
        px = np.floor(xs - np.float32(0.5)).astype(np.int64) % m
    elif cfg.mass_scheme == "tsc":
        px = (np.floor(xs).astype(np.int64) - 1) % m
    else:
        px = np.floor(xs).astype(np.int64) % m
    shard_of = px // planes
    pos_all = np.full((4, n_dev * cap), pallas_pm.SENTINEL, np.float32)
    vel_all = np.zeros((4, n_dev * cap), np.float32)
    pos_all[3] = 0.0
    for d in range(n_dev):
        sel = shard_of == d
        n_local = int(sel.sum())
        if n_local > cap:
            raise ValueError(
                f"shard {d} holds {n_local} particles > capacity {cap}; "
                "raise the slack factor"
            )
        pos_all[:3, d * cap: d * cap + n_local] = position[sel].T
        vel_all[:3, d * cap: d * cap + n_local] = velocity[sel].T
    shard_p = NamedSharding(mesh, P(None, AXIS))
    shard_f = NamedSharding(mesh, P(AXIS))
    pos_dev = jax.device_put(jnp.asarray(pos_all), shard_p)
    vel_dev = jax.device_put(jnp.asarray(vel_all), shard_p)
    acc_dev = jax.device_put(jnp.zeros_like(pos_all), shard_p)
    phi_dev = jax.device_put(jnp.zeros((m, m, m), jnp.float32), shard_f)
    # additional field: scalaron (fr) / Newtonian potential (mond); a
    # token n_dev-plane grid otherwise so the pytree stays cheap
    if cfg.theory in ("fr", "mond"):
        u_dev = jax.device_put(jnp.zeros((m, m, m), jnp.float32), shard_f)
    else:
        u_dev = jax.device_put(
            jnp.zeros((n_dev, 1, 1), jnp.float32), shard_f
        )
    # per-shard tile starts (filled by the first sorted step)
    nt_local = pallas_pm.n_tiles(m, planes) + 1
    ts_dev = jax.device_put(
        jnp.zeros((n_dev * nt_local,), jnp.int32),
        NamedSharding(mesh, P(AXIS)),
    )
    return pos_dev, vel_dev, acc_dev, phi_dev, u_dev, ts_dev


def gather_particles(cfg: SolverConfig, n_dev: int, position, velocity=None):
    """Per-shard column state -> (n_real, 3) row arrays (drops sentinels)."""
    import numpy as np

    pos = np.asarray(position)
    real = pos[0] < pallas_pm.SENTINEL_MIN
    out = [pos[:3, real].T]
    if velocity is not None:
        out.append(np.asarray(velocity)[:3, real].T)
    return out[0] if velocity is None else tuple(out)
