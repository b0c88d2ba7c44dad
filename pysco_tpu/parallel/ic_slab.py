"""Slab-sharded on-device LPT initial conditions.

:mod:`pysco_tpu.ic_device` runs the LPT algebra on one chip; this module
is its ``parallel_mode = slab`` counterpart: the white-noise half grid
(host, reference-exact RNG -- initial_conditions.py:585-732) is uploaded
directly in the sharded pencil layout and every inverse Laplacian,
spectral gradient, Hessian product and lattice initialisation runs
distributed over the device mesh through the :mod:`pysco_tpu.parallel.slab`
pencil-FFT primitives (one ``all_to_all`` per 3D FFT). Nothing larger
than ``1/D`` of a grid ever exists per device, so IC generation scales to
box sizes where the single-chip path would OOM (1024^3: ~30 GB of column
state + ~4 GB k-grids vs 16 GB HBM) -- the step itself already scales
this way, this closes the last single-chip stage. The claim is proven
at shape level in tests/test_1024_shapes.py: every sharded stage traced
at 1024^3 over 8 devices, no per-shard intermediate above 1.5x shard
scale.

The maths mirrors :mod:`pysco_tpu.ic_device` operation for operation
(same op order, same float32 constants; reference
initial_conditions.py:976-1680); tests/test_ic_slab.py checks the two
paths agree on the 8-device virtual CPU mesh.

Particles come out in the per-shard column layout of
:func:`pysco_tpu.parallel.slab.distribute_particles` (each shard holds
its own x-planes of the lattice), so the run loop's first sorted step
(migrate + tile sort) takes over directly -- scheme-base/displacement
stragglers are at most one plane from their owner, exactly what
``migrate`` handles.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import ic as ic_host
from ..ops import mesh as mesh_ops, pallas_pm
from . import slab

AXIS = slab.AXIS
F32 = jnp.float32


# ---------------------------------------------------------------------------
# Spectral kernels on the pencil layout (fourier.py analogues)
# ---------------------------------------------------------------------------

def _hessian_slab(xk, ij, m):
    """-4 pi^2 k_i k_j x on the (M, M/D, M/2+1) pencil (fourier.hessian)."""
    ks = slab._wavenumbers_slab(m, xk.shape[1])
    return -ks[ij[0]] * ks[ij[1]] * F32(4 * jnp.pi ** 2) * xk


def _sum_of_hessian_slab(xk, ij1, ij2, m):
    ks = slab._wavenumbers_slab(m, xk.shape[1])
    return -(ks[ij1[0]] * ks[ij1[1]] + ks[ij2[0]] * ks[ij2[1]]) * F32(
        4 * jnp.pi ** 2
    ) * xk


def _diff_of_hessian_slab(xk, ij1, ij2, m):
    ks = slab._wavenumbers_slab(m, xk.shape[1])
    return -(ks[ij1[0]] * ks[ij1[1]] - ks[ij2[0]] * ks[ij2[1]]) * F32(
        4 * jnp.pi ** 2
    ) * xk


def _ihess(xk, ij, m, n_dev):
    return slab.irfft3_slab(_hessian_slab(xk, ij, m), m)


def _psi_components_slab(src_k, m, n_dev):
    """Spectral gradient -> real-space slabs, one component at a time
    (ic_device._psi_components on the pencil layout)."""
    ks = slab._wavenumbers_slab(m, src_k.shape[1])
    tmp = jnp.complex64(2j * jnp.pi) * src_k
    return tuple(slab.irfft3_slab(tmp * ks[a], m) for a in range(3))


# ---------------------------------------------------------------------------
# Orszag 3/2 dealiasing on the sharded pencil (ic_device.pad_k/trim_k).
#
# The pad moves k-modes across shard boundaries on the (sharded) y axis,
# which a per-shard shard_map body cannot express -- so pad/trim run as
# GLOBAL jitted slice assemblies with a pencil output-sharding
# constraint and GSPMD inserts the collectives. The LPT source algebra
# then runs through the same shard_map stages at the padded size.
# ---------------------------------------------------------------------------

def _pad_pencil(mesh, m):
    """Zero-pad a sharded rfft pencil to 3M/2 (ic_device.pad_k)."""
    ne, m2 = 3 * m // 2, m // 2
    out_s = NamedSharding(mesh, P(None, AXIS, None))

    def f(x):
        out = jnp.zeros((ne, ne, ne // 2 + 1), x.dtype)
        out = out.at[:m2, :m2, :m2].set(x[:m2, :m2, :m2])
        out = out.at[-m2 + 1:, :m2, :m2].set(x[-m2 + 1:, :m2, :m2])
        out = out.at[:m2, -m2 + 1:, :m2].set(x[:m2, -m2 + 1:, :m2])
        out = out.at[-m2 + 1:, -m2 + 1:, :m2].set(
            x[-m2 + 1:, -m2 + 1:, :m2]
        )
        return lax.with_sharding_constraint(out, out_s)

    return jax.jit(f)


def _trim_pencil(mesh, me, rescale):
    """Inverse of :func:`_pad_pencil` with the real-space rescale folded
    in (linear, so it commutes with the k-space trim)."""
    m = 2 * me // 3
    m2 = m // 2
    out_s = NamedSharding(mesh, P(None, AXIS, None))

    def f(x):
        out = jnp.zeros((m, m, m2 + 1), x.dtype)
        out = out.at[:m2, :m2, :m2].set(x[:m2, :m2, :m2])
        out = out.at[-m2 + 1:, :m2, :m2].set(x[-m2 + 1:, :m2, :m2])
        out = out.at[:m2, -m2 + 1:, :m2].set(x[:m2, -m2 + 1:, :m2])
        out = out.at[-m2 + 1:, -m2 + 1:, :m2].set(
            x[-m2 + 1:, -m2 + 1:, :m2]
        )
        return lax.with_sharding_constraint(out * F32(rescale), out_s)

    return jax.jit(f)


# ---------------------------------------------------------------------------
# LPT sources (ic_device.compute_* on the pencil layout; when dealiasing,
# the caller passes the PADDED pencils and m = 3n/2)
# ---------------------------------------------------------------------------

def _rhs_2ndorder(p1, m, n_dev):
    rhs = _ihess(p1, (0, 0), m, n_dev) * slab.irfft3_slab(
        _sum_of_hessian_slab(p1, (1, 1), (2, 2), m), m
    )
    rhs += _ihess(p1, (1, 1), m, n_dev) * _ihess(p1, (2, 2), m, n_dev)
    rhs -= _ihess(p1, (0, 1), m, n_dev) ** 2
    rhs -= _ihess(p1, (0, 2), m, n_dev) ** 2
    rhs -= _ihess(p1, (1, 2), m, n_dev) ** 2
    return rhs


def _rhs_3a(p1, m, n_dev):
    h01 = _ihess(p1, (0, 1), m, n_dev)
    h02 = _ihess(p1, (0, 2), m, n_dev)
    h12 = _ihess(p1, (1, 2), m, n_dev)
    h00 = _ihess(p1, (0, 0), m, n_dev)
    h11 = _ihess(p1, (1, 1), m, n_dev)
    h22 = _ihess(p1, (2, 2), m, n_dev)
    rhs = h00 * h11 * h22
    rhs += F32(2) * h01 * h02 * h12
    rhs -= h12 * h12 * h00
    rhs -= h02 * h02 * h11
    rhs -= h01 * h01 * h22
    return rhs


def _rhs_3b(p1, p2, m, n_dev):
    half = F32(0.5)
    rhs = half * _ihess(p1, (0, 0), m, n_dev) * slab.irfft3_slab(
        _sum_of_hessian_slab(p2, (1, 1), (2, 2), m), m
    )
    rhs += half * _ihess(p1, (1, 1), m, n_dev) * slab.irfft3_slab(
        _sum_of_hessian_slab(p2, (0, 0), (2, 2), m), m
    )
    rhs += half * _ihess(p1, (2, 2), m, n_dev) * slab.irfft3_slab(
        _sum_of_hessian_slab(p2, (0, 0), (1, 1), m), m
    )
    rhs -= _ihess(p1, (0, 1), m, n_dev) * _ihess(p2, (0, 1), m, n_dev)
    rhs -= _ihess(p1, (0, 2), m, n_dev) * _ihess(p2, (0, 2), m, n_dev)
    rhs -= _ihess(p1, (1, 2), m, n_dev) * _ihess(p2, (1, 2), m, n_dev)
    return rhs


def _rhs_3c(p1, p2, m, n_dev, component):
    d = _diff_of_hessian_slab
    if component == 0:
        rhs = _ihess(p1, (0, 2), m, n_dev) * _ihess(p2, (0, 1), m, n_dev)
        rhs -= _ihess(p2, (0, 2), m, n_dev) * _ihess(p1, (0, 1), m, n_dev)
        rhs += _ihess(p1, (1, 2), m, n_dev) * slab.irfft3_slab(
            d(p2, (1, 1), (2, 2), m), m
        )
        rhs -= _ihess(p2, (1, 2), m, n_dev) * slab.irfft3_slab(
            d(p1, (1, 1), (2, 2), m), m
        )
    elif component == 1:
        rhs = _ihess(p1, (0, 1), m, n_dev) * _ihess(p2, (1, 2), m, n_dev)
        rhs -= _ihess(p2, (0, 1), m, n_dev) * _ihess(p1, (1, 2), m, n_dev)
        rhs += _ihess(p1, (0, 2), m, n_dev) * slab.irfft3_slab(
            d(p2, (2, 2), (0, 0), m), m
        )
        rhs -= _ihess(p2, (0, 2), m, n_dev) * slab.irfft3_slab(
            d(p1, (2, 2), (0, 0), m), m
        )
    else:
        rhs = _ihess(p1, (1, 2), m, n_dev) * _ihess(p2, (0, 2), m, n_dev)
        rhs -= _ihess(p2, (1, 2), m, n_dev) * _ihess(p1, (0, 2), m, n_dev)
        rhs += _ihess(p1, (0, 1), m, n_dev) * slab.irfft3_slab(
            d(p2, (0, 0), (1, 1), m), m
        )
        rhs -= _ihess(p2, (0, 1), m, n_dev) * slab.irfft3_slab(
            d(p1, (0, 0), (1, 1), m), m
        )
    return rhs


# ---------------------------------------------------------------------------
# Jitted sharded stages (ic_device stages under shard_map)
# ---------------------------------------------------------------------------

def _add_nlpt_cols(position, velocity, src_k, m, n_dev, n_local,
                   dplus_n, fH_n):
    """psi = grad(src) accumulated onto the shard's real columns."""
    dplus_n = F32(dplus_n)
    dfH = F32(dplus_n) * F32(fH_n)
    psis = _psi_components_slab(src_k, m, n_dev)
    for a in range(3):
        pa = psis[a].reshape(-1)
        position = position.at[a, :n_local].add(dplus_n * pa)
        velocity = velocity.at[a, :n_local].add(dfH * pa)
    return position, velocity


def _flip_y(u, n_dev: int):
    """Global y-flip (index j -> (-j) % n) of an axis-1-sharded block:
    local reverse + shard-order reversal, then a one-plane roll."""
    if n_dev == 1:
        return jnp.roll(u[:, ::-1], 1, axis=1)
    rev = lax.ppermute(u[:, ::-1], AXIS,
                       [(i, n_dev - 1 - i) for i in range(n_dev)])
    last = lax.ppermute(rev[:, -1:], AXIS, slab._perm_fwd(n_dev))
    return jnp.concatenate([last, rev[:, :-1]], axis=1)


def _make_noise_to_density_k(mesh, n: int, n_dev: int, fixed: bool):
    """Sharded counterpart of ic_device._noise_to_density_k: raw uniform
    draws (axis-1/y sharded) -> Hermitian white noise x transfer on the
    (n, n/D, n/2+1) pencil. Only the Hermitian lower-plane build and the
    two self-planes communicate (one y-flip ppermute pair + two tiny
    plane all_gathers); everything else is local elementwise."""
    from ..ic_device import _hermitian_self_plane_jnp

    c = n // n_dev
    middle = n // 2

    def fn(draw_a, draw_b, corners, table):
        r = lax.axis_index(AXIS)
        if fixed:
            # draw_a = phases, draw_b unused, corners[0] = paired shift
            phase = F32(2 * np.pi) * draw_a + corners[0]
            U = lax.complex(jnp.cos(phase), jnp.sin(phase))
            cvals = jnp.ones(7, jnp.complex64)
        else:
            phase = F32(2 * np.pi) * draw_b
            amplitude = jnp.sqrt(-jnp.log(F32(1) - draw_a))
            U = lax.complex(amplitude * jnp.cos(phase),
                            amplitude * jnp.sin(phase))
            cvals = jnp.sqrt(-jnp.log(F32(1) - corners)).astype(jnp.complex64)
        u0 = lax.all_gather(U[0], AXIS, axis=0, tiled=True)
        um = lax.all_gather(U[middle], AXIS, axis=0, tiled=True)
        s0 = _hermitian_self_plane_jnp(u0)[:, : middle + 1]
        sm = _hermitian_self_plane_jnp(um)[:, : middle + 1]
        s0 = lax.dynamic_slice_in_dim(s0, r * c, c, 0)
        sm = lax.dynamic_slice_in_dim(sm, r * c, c, 0)
        upper = U[1:middle, :, : middle + 1]
        kp_half = (-jnp.arange(middle + 1)) % n
        lower = jnp.conj(_flip_y(U[1:middle], n_dev)[:, :, kp_half])[::-1]
        out = jnp.concatenate([s0[None], upper, sm[None], lower], axis=0)
        # zero mode + the 7 corner draws (ic.py corner fixes, same order)
        for i, (x, y, z) in enumerate((
            (0, 0, 0),
            (0, 0, middle), (0, middle, 0), (0, middle, middle),
            (middle, 0, 0), (middle, 0, middle), (middle, middle, 0),
            (middle, middle, middle),
        )):
            val = jnp.complex64(0) if i == 0 else cvals[i - 1]
            out = out.at[x, y % c, z].set(
                jnp.where(r == y // c, val, out[x, y % c, z])
            )
        # transfer multiply: integer |k|^2 gather on the local y block
        half = middle
        kx = ((jnp.arange(n) + half) % n - half)
        ky = ((r * c + jnp.arange(c) + half) % n - half)
        k2 = ((kx * kx)[:, None, None] + (ky * ky)[None, :, None]
              + (jnp.arange(half + 1) ** 2)[None, None, :])
        return out * table[k2]

    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, AXIS, None), P(None, AXIS, None), P(), P()),
        out_specs=P(None, AXIS, None),
    ))


def _make_stage_1lpt(mesh, m, n_dev, cap):
    """density_k pencil -> (phi1_k pencil, per-shard lattice columns)."""
    n_local = (m // n_dev) * m * m  # lattice sites per shard

    def fn(density_k, offset, dplus_1, fH_1):
        phi1_k = slab.inverse_laplacian_slab(density_k, m, 0)
        r = lax.axis_index(AXIS)
        planes = m // n_dev
        h = F32(1.0 / m)
        dplus_1 = F32(dplus_1)
        dfH = F32(dplus_1) * F32(fH_1)
        psis = _psi_components_slab(phi1_k, m, n_dev)
        cx = ((r * planes + jnp.arange(planes, dtype=F32)) * h + offset)
        cyz = jnp.arange(m, dtype=F32) * h + offset
        coords = [cx.reshape(planes, 1, 1), cyz.reshape(1, m, 1),
                  cyz.reshape(1, 1, m)]
        pos = jnp.full((4, cap), F32(pallas_pm.SENTINEL))
        pos = pos.at[3].set(F32(0))
        vel = jnp.zeros((4, cap), F32)
        for a in range(3):
            pa = jnp.broadcast_to(coords[a] - dplus_1 * psis[a],
                                  (planes, m, m)).reshape(-1)
            pos = pos.at[a, :n_local].set(pa)
            vel = vel.at[a, :n_local].set((-dfH * psis[a]).reshape(-1))
        return phi1_k, pos, vel

    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, AXIS, None), P(), P(), P()),
        out_specs=(P(None, AXIS, None), P(None, AXIS), P(None, AXIS)),
        check_vma=False,
    ))


def _make_rhs_k(mesh, m, n_dev, term):
    """LPT source in k-space at pencil size ``m`` (the PADDED size when
    dealiasing): pencils in, rfft3_slab(real rhs) out."""
    spec_k = P(None, AXIS, None)

    if term == "2":
        def fn(p1):
            return slab.rfft3_slab(_rhs_2ndorder(p1, m, n_dev), n_dev)

        in_specs = (spec_k,)
    elif term == "a":
        def fn(p1, p2):
            del p2
            return slab.rfft3_slab(_rhs_3a(p1, m, n_dev), n_dev)

        in_specs = (spec_k, spec_k)
    elif term == "b":
        def fn(p1, p2):
            return slab.rfft3_slab(_rhs_3b(p1, p2, m, n_dev), n_dev)

        in_specs = (spec_k, spec_k)
    else:
        comp = "xyz".index(term[1])

        def fn(p1, p2):
            return slab.rfft3_slab(_rhs_3c(p1, p2, m, n_dev, comp), n_dev)

        in_specs = (spec_k, spec_k)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=spec_k, check_vma=False))


def _make_apply_src(mesh, m, n_dev, cap, return_src_k):
    """src_k = invlap(rhs_k); psi = grad(src) added to the shard columns
    (ic_device._stage_2lpt / _stage_3lpt_term tails)."""
    n_local = (m // n_dev) * m * m

    def fn(rhs_k, position, velocity, dplus_n, fH_n):
        src_k = slab.inverse_laplacian_slab(rhs_k, m, 0)
        position, velocity = _add_nlpt_cols(
            position, velocity, src_k, m, n_dev, n_local, dplus_n, fH_n
        )
        if return_src_k:
            return src_k, position, velocity
        return position, velocity

    spec_k = P(None, AXIS, None)
    spec_c = P(None, AXIS)
    out = ((spec_k, spec_c, spec_c) if return_src_k
           else (spec_c, spec_c))
    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(spec_k, spec_c, spec_c, P(), P()),
        out_specs=out, check_vma=False,
    ), donate_argnums=(1, 2))


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def supported(param, n_dev: int) -> bool:
    """Slab device ICs cover the LPT path (dealiased included: the
    Orszag pad/trim run as global jitted slice assemblies under GSPMD)
    when the particle lattice equal-splits over the mesh -- n_p a
    multiple of 2*D keeps the pencil layout valid at both n_p and the
    padded 3*n_p/2."""
    ics = param["initial_conditions"]
    if isinstance(ics, (int, np.integer)) and not isinstance(ics, bool):
        return False
    if "lpt" not in str(ics).casefold():
        return False
    if not bool(param.get("ic_device", True)):
        return False
    if str(param.get("particle_engine", "pallas")).casefold() != "pallas":
        return False  # the slab step itself requires the pallas engine
    n_p = round(float(param["npart"]) ** (1.0 / 3.0))
    return (
        n_p ** 3 == int(param["npart"])
        and n_p % (2 * n_dev) == 0
        and int(param["ncoarse"]) >= 1
        and 2 ** int(param["ncoarse"]) % n_dev == 0
    )


def generate_lpt_slab(param, tables, mesh: Mesh):
    """Slab-sharded 1/2/3LPT; returns the full distributed state tuple of
    :func:`pysco_tpu.parallel.slab.distribute_particles` (pos, vel, acc,
    phi, u, tile_starts) without the particles ever being gathered."""
    from time import perf_counter

    from .. import solver as solver_mod
    from ..utils.units import PC_M

    t0 = perf_counter()
    n_dev = mesh.devices.size
    order = str(param["initial_conditions"]).casefold()
    if order not in ("1lpt", "2lpt", "3lpt"):
        raise ValueError(
            f"initial_conditions={order}, should be 1LPT, 2LPT or 3LPT"
        )
    a_start = 1.0 / (1 + param["z_start"])
    lna_start = np.log(a_start)
    logging.warning("z_start=%s (slab device IC path, %d devices)",
                    param["z_start"], n_dev)
    Hz = tables[2](lna_start)
    Hz = Hz * param["unit_t"] / (1e3 * PC_M)  # km/s/Mpc -> box units

    npart = int(param["npart"])
    n_p = round(npart ** (1.0 / 3.0))
    slack = float(param.get("slab_slack", 1.25))
    cap = slab.shard_capacity(npart, n_dev, slack)

    # host: ONLY the raw reference-exact RNG draws (same order as ic.py
    # white_noise_fourier[_fixed]), uploaded straight into the sharded
    # y-pencil layout; Rayleigh map, trig, Hermitian assembly and the
    # transfer multiply run distributed (_make_noise_to_density_k)
    middle = n_p // 2
    seed = int(param["seed"])
    rng = (np.random.default_rng(seed) if seed >= 0
           else np.random.default_rng())
    fixed = bool(param["fixed_ICS"])
    shard_draw = NamedSharding(mesh, P(None, AXIS, None))
    table = jnp.asarray(ic_host.transfer_table(param, n_p))
    if fixed:
        phases = rng.random((middle + 1, n_p, n_p), dtype=np.float32)
        draw_a = jax.device_put(phases, shard_draw)
        draw_b = draw_a  # unused in the fixed variant
        corners = jnp.full(
            7, np.pi if bool(param["paired_ICS"]) else 0.0, jnp.float32
        )  # corners[0] carries the paired phase shift
    else:
        amps = rng.random((middle + 1, n_p, n_p), dtype=np.float32)
        phases = rng.random((middle + 1, n_p, n_p), dtype=np.float32)
        draw_a = jax.device_put(amps, shard_draw)
        draw_b = jax.device_put(phases, shard_draw)
        corners = jnp.asarray(rng.random(7, dtype=np.float32))
        del amps
    del phases
    density_k = _make_noise_to_density_k(mesh, n_p, n_dev, fixed)(
        draw_a, draw_b, corners, table
    )
    del draw_a, draw_b

    dplus_1_z0 = tables[3](0)
    dplus_1 = np.float32(tables[3](lna_start) / dplus_1_z0)
    fH_1 = np.float32(tables[4](lna_start) * Hz)
    offset = np.float32(
        0.5 / n_p if str(param["position_ICS"]).casefold() == "center"
        else 0.0
    )
    phi1_k, position, velocity = _make_stage_1lpt(mesh, n_p, n_dev, cap)(
        density_k, offset, dplus_1, fH_1
    )
    del density_k

    if order != "1lpt":
        dealias = bool(param["dealiased_ICS"])
        me = 3 * n_p // 2 if dealias else n_p
        pad = _pad_pencil(mesh, n_p) if dealias else (lambda x: x)

        def rhs_k(term, rescale, *pencils):
            rk = _make_rhs_k(mesh, me, n_dev, term)(*pencils)
            if dealias:
                rk = _trim_pencil(mesh, me, rescale)(rk)
            return rk

        logging.warning("Compute 2LPT contribution (slab)")
        dplus_2 = np.float32(tables[5](lna_start) / dplus_1_z0 ** 2)
        fH_2 = np.float32(tables[6](lna_start) * Hz)
        p1e = pad(phi1_k)
        phi2_k, position, velocity = _make_apply_src(
            mesh, n_p, n_dev, cap, True
        )(rhs_k("2", 1.5 ** 3, p1e), position, velocity, dplus_2, fH_2)
        if order == "3lpt":
            terms = (
                ("a", 1.5 ** 6,
                 -np.float32(tables[7](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[8](lna_start) * Hz)),
                ("b", 1.5 ** 3,
                 -np.float32(tables[9](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[10](lna_start) * Hz)),
                ("cx", 1.5 ** 3,
                 -np.float32(tables[11](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[12](lna_start) * Hz)),
                ("cy", 1.5 ** 3,
                 -np.float32(tables[11](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[12](lna_start) * Hz)),
                ("cz", 1.5 ** 3,
                 -np.float32(tables[11](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[12](lna_start) * Hz)),
            )
            p2e = pad(phi2_k)
            apply_src = _make_apply_src(mesh, n_p, n_dev, cap, False)
            for term, rescale, dplus_n, fH_n in terms:
                logging.warning("Compute 3LPT %s contribution (slab)", term)
                position, velocity = apply_src(
                    rhs_k(term, rescale, p1e, p2e),
                    position, velocity, dplus_n, fH_n,
                )
            del p2e
        del p1e, phi2_k
    del phi1_k

    position = jax.jit(mesh_ops.periodic_wrap)(position)
    float(jnp.sum(position[:1, :8]))  # value-fetch barrier (axon)
    logging.warning("Slab device IC generation: %.1f s",
                    perf_counter() - t0)

    cfg = solver_mod.config_from_param(param)
    if bool(param.get("write_initial_snapshot", True)):
        pos_np, vel_np = slab.gather_particles(
            cfg, n_dev, position, velocity
        )
        ic_host.finalise_initial_conditions(pos_np, vel_np, param)
        logging.warning("Slab device IC + snapshot write: %.1f s",
                        perf_counter() - t0)

    # rest of the distribute_particles state (zeros; the run loop's
    # first sorted step migrates scheme-base/displacement stragglers
    # and builds the tile starts)
    m = cfg.ncells_1d
    shard_p = NamedSharding(mesh, P(None, AXIS))
    shard_f = NamedSharding(mesh, P(AXIS))
    acc = jax.device_put(jnp.zeros((4, n_dev * cap), F32), shard_p)
    phi = jax.device_put(jnp.zeros((m, m, m), F32), shard_f)
    if cfg.theory in ("fr", "mond"):
        u = jax.device_put(jnp.zeros((m, m, m), F32), shard_f)
    else:
        u = jax.device_put(jnp.zeros((n_dev, 1, 1), F32), shard_f)
    nt_local = pallas_pm.n_tiles(m, m // n_dev) + 1
    ts = jax.device_put(jnp.zeros((n_dev * nt_local,), jnp.int32),
                        NamedSharding(mesh, P(AXIS)))
    return position, velocity, acc, phi, u, ts
