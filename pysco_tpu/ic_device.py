"""On-device LPT initial conditions.

The host keeps ONLY the raw reference-exact RNG draws (bit-parity with
the reference stream, initial_conditions.py:585-658); the uploaded draw
arrays are assembled to Hermitian white noise x transfer on device and
then flow through the :mod:`pysco_tpu.ops.fourier` kernels:
inverse Laplacians, spectral gradients, Hessian products for the
2LPT/3LPT sources (incl. the rotational Ax/Ay/Az terms), Orszag 3/2
dealiasing, and the particle-lattice initialisation -- the reference's
Numba+FFTW IC pipeline (initial_conditions.py:976-1680, fourier.py:104-453)
re-expressed as a few jitted XLA programs. At 512^3 the host path is
~20 single-threaded 768^3 FFTs plus ~3 GB temporaries; the same algebra
on the chip takes seconds.

Particles are produced directly in the pallas engine's (4, N_up) column
layout, so no (npart, 3) row array is ever materialised in HBM.

Math mirrors ic.py operation for operation (same op order, same float32
constants); tests/test_ic_device.py checks the two paths agree at 32^3.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import ic as ic_host
from .ops import fourier

F32 = jnp.float32
C64 = jnp.complex64


# ---------------------------------------------------------------------------
# Orszag 3/2 dealiasing on device (ic.py pad/trim; static shapes)
# ---------------------------------------------------------------------------

def pad_k(x: jax.Array) -> jax.Array:
    """Zero-pad an rfft half grid to 3N/2 (initial_conditions.py:1859)."""
    n = x.shape[0]
    ne = 3 * n // 2
    m = n // 2
    out = jnp.zeros((ne, ne, ne // 2 + 1), dtype=x.dtype)
    out = out.at[:m, :m, :m].set(x[:m, :m, :m])
    out = out.at[-m + 1:, :m, :m].set(x[-m + 1:, :m, :m])
    out = out.at[:m, -m + 1:, :m].set(x[:m, -m + 1:, :m])
    out = out.at[-m + 1:, -m + 1:, :m].set(x[-m + 1:, -m + 1:, :m])
    return out


def trim_k(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pad_k` (initial_conditions.py:1897)."""
    ne = x.shape[0]
    n = 2 * ne // 3
    m = n // 2
    out = jnp.zeros((n, n, m + 1), dtype=x.dtype)
    out = out.at[:m, :m, :m].set(x[:m, :m, :m])
    out = out.at[-m + 1:, :m, :m].set(x[-m + 1:, :m, :m])
    out = out.at[:m, -m + 1:, :m].set(x[:m, -m + 1:, :m])
    out = out.at[-m + 1:, -m + 1:, :m].set(x[-m + 1:, -m + 1:, :m])
    return out


# ---------------------------------------------------------------------------
# Small jitted programs -- one FFT each (the 512^3 OOM fix)
# ---------------------------------------------------------------------------
# A single mega-program per LPT order hands XLA one buffer-assignment
# problem containing every Hessian FFT temporary, all three displacement
# grids and the donated 4.3 GB column state at once; at 512^3 the
# resulting temp arena exceeds the 16 GB HBM of one chip (measured
# RESOURCE_EXHAUSTED). Splitting into sequential single-FFT programs
# caps each program's arena at ~one FFT workspace, and the host driver
# controls exactly which 512 MB real grids stay live between programs.
# The float32 op ORDER inside every term is kept identical to the old
# fused stages (and to ic.py), so the 32^3 device-vs-host equality test
# still passes bit-for-bit.

_pad = jax.jit(pad_k)


@jax.jit
def _trim(rhs, rescale):
    """Orszag 3/2 trim back to N plus the 1.5^k volume rescale."""
    return fourier.irfft3(trim_k(fourier.rfft3(rhs))) * F32(rescale)


@jax.jit
def _density_to_phi1(density_k):
    return fourier.inverse_laplacian(density_k)


# ---------------------------------------------------------------------------
# White noise assembly on device
# ---------------------------------------------------------------------------
# The host keeps ONLY the raw reference-order uniform draws (two
# rng.random((middle+1, n, n)) calls + 7 corner scalars -- ~2 s at 512^3
# on this single-core host); the Rayleigh map, trig, Hermitian assembly,
# corner fixes and transfer multiply (initial_conditions.py:585-658 +
# the sqrt(P(k)) interpolation gather) run as one jitted program. The
# uploaded bytes are identical to uploading the assembled grid (2 f32
# per independent mode), but the host-side assembly (~19 s of the old
# 21 s "draw" stage at 512^3) disappears. Device trig/log differ from
# NumPy at ULP level, within the 5e-6 device-vs-host test tolerance
# (the RNG stream itself stays bit-exact with the reference).


def _hermitian_self_plane_jnp(plane):
    """Device version of ic.py _hermitian_self_plane (last-write-wins
    resolution of the i=0 and i=middle planes)."""
    n = plane.shape[0]
    j = jnp.arange(n)
    jp = (-j) % n
    t_up = j[:, None] * n + j[None, :]
    t_low = jp[:, None] * n + jp[None, :]
    lower = jnp.conj(plane[jp[:, None], jp[None, :]])
    return jnp.where(t_low >= t_up, lower, plane)


def _assemble_half_grid_jnp(U):
    """Device version of ic.py _assemble_half_grid: rfft half grid
    (n, n, middle+1) from the upper-half draws U[(middle+1), n, n]."""
    middle_p1, n, _ = U.shape
    middle = middle_p1 - 1
    jp = (-jnp.arange(n)) % n
    kp_half = (-jnp.arange(middle + 1)) % n
    self0 = _hermitian_self_plane_jnp(U[0])[:, : middle + 1]
    selfm = _hermitian_self_plane_jnp(U[middle])[:, : middle + 1]
    upper = U[1:middle, :, : middle + 1]
    # planes middle+1..n-1 hold conj(U[n-i]) reindexed; built for
    # i = 1..middle-1 ascending then reversed to ascending plane index
    lower = jnp.conj(U[1:middle][:, jp][:, :, kp_half])[::-1]
    return jnp.concatenate(
        [self0[None], upper, selfm[None], lower], axis=0
    )


def _k2_int_grid(n: int):
    """Integer |k|^2 on the rfft half grid (exact; matches the intp grid
    in ic.get_transfer_grid)."""
    half = n // 2
    ki = (jnp.arange(n) + half) % n - half
    return (
        (ki * ki)[:, None, None]
        + (ki * ki)[None, :, None]
        + (jnp.arange(half + 1) ** 2)[None, None, :]
    )


def _corner_indices(middle: int):
    m = middle
    return (
        (0, 0, m), (0, m, 0), (0, m, m),
        (m, 0, 0), (m, 0, m), (m, m, 0), (m, m, m),
    )


@jax.jit
def _noise_to_density_k(amps, phases, corners, table):
    """Rayleigh white noise -> Hermitian half grid -> x transfer
    (ic.py white_noise_fourier + generate_density_fourier)."""
    middle = amps.shape[0] - 1
    phase = F32(2 * np.pi) * phases
    amplitude = jnp.sqrt(-jnp.log(F32(1) - amps))
    U = jax.lax.complex(amplitude * jnp.cos(phase),
                        amplitude * jnp.sin(phase))
    out = _assemble_half_grid_jnp(U)
    out = out.at[0, 0, 0].set(0)
    cvals = jnp.sqrt(-jnp.log(F32(1) - corners)).astype(C64)
    for i, idx in enumerate(_corner_indices(middle)):
        out = out.at[idx].set(cvals[i])
    return out * table[_k2_int_grid(out.shape[0])]


@jax.jit
def _noise_fixed_to_density_k(phases, shift, table):
    """Unit-amplitude ("fixed") variant, phase-shifted by pi when paired
    (ic.py white_noise_fourier_fixed)."""
    middle = phases.shape[0] - 1
    phase = F32(2 * np.pi) * phases + shift
    U = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    out = _assemble_half_grid_jnp(U)
    out = out.at[0, 0, 0].set(0)
    for idx in _corner_indices(middle):
        out = out.at[idx].set(1.0 + 0.0j)
    return out * table[_k2_int_grid(out.shape[0])]


@partial(jax.jit, static_argnums=(1,))
def _hess_real(src_k, ij):
    return fourier.irfft3(fourier.hessian(src_k, ij))


@partial(jax.jit, static_argnums=(1, 2))
def _sum_hess_real(src_k, ij1, ij2):
    return fourier.irfft3(fourier.sum_of_hessian(src_k, ij1, ij2))


@partial(jax.jit, static_argnums=(1, 2))
def _diff_hess_real(src_k, ij1, ij2):
    return fourier.irfft3(fourier.diff_of_hessian(src_k, ij1, ij2))


@partial(jax.jit, static_argnums=(1,))
def _psi_axis(src_k, axis):
    """irfft3(2j pi k_axis src_k): one displacement component at a time
    (never holds the (N, N, N, 3) stack; fourier.py:239-247)."""
    n = src_k.shape[0]
    ks = fourier._wavenumbers(n)
    tmp = jnp.complex64(2j * jnp.pi) * src_k
    return fourier.irfft3(tmp * ks[axis])


@jax.jit
def _invlap_of_real(rhs):
    return fourier.inverse_laplacian(fourier.rfft3(rhs))


# elementwise accumulation programs (rhs donated: updated in place)
@jax.jit
def _mul(a, b):
    return a * b


@jax.jit
def _mul3(a, b, c):
    return a * b * c


@jax.jit
def _half_mul(a, b):
    return F32(0.5) * a * b


@partial(jax.jit, donate_argnums=(0,))
def _add_prod(rhs, a, b):
    return rhs + a * b


@partial(jax.jit, donate_argnums=(0,))
def _sub_prod(rhs, a, b):
    return rhs - a * b


@partial(jax.jit, donate_argnums=(0,))
def _add_half_prod(rhs, a, b):
    return rhs + F32(0.5) * a * b


@partial(jax.jit, donate_argnums=(0,))
def _sub_sq(rhs, a):
    return rhs - a ** 2


@partial(jax.jit, donate_argnums=(0,))
def _add_2prod3(rhs, a, b, c):
    return rhs + F32(2) * a * b * c


@partial(jax.jit, donate_argnums=(0,))
def _sub_prod3(rhs, a, b, c):
    return rhs - a * b * c


# The lattice programs keep the column state viewed as (4, n^2, n): a
# 3D->1D reshape whose producer is any COMPUTED value (not a pure copy)
# compiles ~250x slower on this toolchain (measured 150 s vs 0.6 s per
# program at 512^3 -- the flat minor dim forces a full relayout through
# the fused producer). Reshaping (n, n, n) -> (n^2, n) keeps the minor
# dim, so it is a layout-preserving bitcast; the single pure-reshape
# collapse to (4, n^3) at the end costs ~1 s.

@partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
def _init_axis(axis, position, velocity, psi, offset, dplus_1, fH_1):
    """1LPT lattice init of one axis of the (4, n^2, n) column state
    (ic.py initialise_1LPT, reference initial_conditions.py:1688-1748)."""
    n = psi.shape[0]
    h = F32(1.0 / n)
    coords = jnp.arange(n, dtype=F32) * h + offset
    shape = [1, 1, 1]
    shape[axis] = n
    dplus_1 = F32(dplus_1)
    dfH = F32(dplus_1) * F32(fH_1)
    pa = coords.reshape(shape) - dplus_1 * psi
    position = position.at[axis].set(
        jnp.broadcast_to(pa, (n, n, n)).reshape(n * n, n)
    )
    velocity = velocity.at[axis].set((-dfH * psi).reshape(n * n, n))
    return position, velocity


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
def _add_axis(axis, position, velocity, psi, dplus_n, fH_n):
    """psi component accumulated onto the column state (ic.py add_nLPT)."""
    n = psi.shape[0]
    dplus_n = F32(dplus_n)
    dfH = F32(dplus_n) * F32(fH_n)
    pa = psi.reshape(n * n, n)
    position = position.at[axis].add(dplus_n * pa)
    velocity = velocity.at[axis].add(dfH * pa)
    return position, velocity


@partial(jax.jit, donate_argnums=(0,))
def _collapse_cols(state):
    """(4, n^2, n) -> (4, n^3): the one flat reshape, a pure copy."""
    return state.reshape(4, state.shape[1] * state.shape[2])


# ---------------------------------------------------------------------------
# LPT sources (ic.py:379-435 on device); host drivers issuing the small
# programs above with explicit del's between terms. At most rhs + 3 real
# grids are live at any point.
# ---------------------------------------------------------------------------

def compute_2ndorder_rhs(phi1_k, dealias: bool):
    p1 = _pad(phi1_k) if dealias else phi1_k
    s = _sum_hess_real(p1, (1, 1), (2, 2))
    h = _hess_real(p1, (0, 0))
    rhs = _mul(h, s)
    del h, s
    a = _hess_real(p1, (1, 1))
    b = _hess_real(p1, (2, 2))
    rhs = _add_prod(rhs, a, b)
    del a, b
    for ij in ((0, 1), (0, 2), (1, 2)):
        h = _hess_real(p1, ij)
        rhs = _sub_sq(rhs, h)
        del h
    del p1
    return _trim(rhs, np.float32(1.5 ** 3)) if dealias else rhs


def compute_3a_rhs(phi1_k, dealias: bool):
    p1 = _pad(phi1_k) if dealias else phi1_k
    h00 = _hess_real(p1, (0, 0))
    h11 = _hess_real(p1, (1, 1))
    h22 = _hess_real(p1, (2, 2))
    rhs = _mul3(h00, h11, h22)
    del h00, h11, h22  # recomputed below: caps live grids at rhs + 3
    h01 = _hess_real(p1, (0, 1))
    h02 = _hess_real(p1, (0, 2))
    h12 = _hess_real(p1, (1, 2))
    rhs = _add_2prod3(rhs, h01, h02, h12)
    h00 = _hess_real(p1, (0, 0))
    rhs = _sub_prod3(rhs, h12, h12, h00)
    del h12, h00
    h11 = _hess_real(p1, (1, 1))
    rhs = _sub_prod3(rhs, h02, h02, h11)
    del h02, h11
    h22 = _hess_real(p1, (2, 2))
    rhs = _sub_prod3(rhs, h01, h01, h22)
    del h01, h22, p1
    return _trim(rhs, np.float32(1.5 ** 6)) if dealias else rhs


def compute_3b_rhs(phi1_k, phi2_k, dealias: bool):
    if dealias:
        p1, p2 = _pad(phi1_k), _pad(phi2_k)
    else:
        p1, p2 = phi1_k, phi2_k
    h = _hess_real(p1, (0, 0))
    s = _sum_hess_real(p2, (1, 1), (2, 2))
    rhs = _half_mul(h, s)
    del h, s
    h = _hess_real(p1, (1, 1))
    s = _sum_hess_real(p2, (0, 0), (2, 2))
    rhs = _add_half_prod(rhs, h, s)
    del h, s
    h = _hess_real(p1, (2, 2))
    s = _sum_hess_real(p2, (0, 0), (1, 1))
    rhs = _add_half_prod(rhs, h, s)
    del h, s
    for ij in ((0, 1), (0, 2), (1, 2)):
        a = _hess_real(p1, ij)
        b = _hess_real(p2, ij)
        rhs = _sub_prod(rhs, a, b)
        del a, b
    del p1, p2
    return _trim(rhs, np.float32(1.5 ** 3)) if dealias else rhs


def compute_3c_rhs(phi1_k, phi2_k, dealias: bool, component: int):
    """Rotational 3LPT source A_x/A_y/A_z (ic.py:417-435)."""
    if dealias:
        p1, p2 = _pad(phi1_k), _pad(phi2_k)
    else:
        p1, p2 = phi1_k, phi2_k
    # (first hessian pair, second pair, diff axes) per component
    ij_a, ij_b, dd = {
        0: ((0, 2), (0, 1), ((1, 1), (2, 2))),
        1: ((0, 1), (1, 2), ((2, 2), (0, 0))),
        2: ((1, 2), (0, 2), ((0, 0), (1, 1))),
    }[component]
    a = _hess_real(p1, ij_a)
    b = _hess_real(p2, ij_b)
    rhs = _mul(a, b)
    del a, b
    a = _hess_real(p2, ij_a)
    b = _hess_real(p1, ij_b)
    rhs = _sub_prod(rhs, a, b)
    del a, b
    a = _hess_real(p1, (1, 2) if component == 0 else
                   ((0, 2) if component == 1 else (0, 1)))
    d = _diff_hess_real(p2, *dd)
    rhs = _add_prod(rhs, a, d)
    del a, d
    a = _hess_real(p2, (1, 2) if component == 0 else
                   ((0, 2) if component == 1 else (0, 1)))
    d = _diff_hess_real(p1, *dd)
    rhs = _sub_prod(rhs, a, d)
    del a, d, p1, p2
    return _trim(rhs, np.float32(1.5 ** 3)) if dealias else rhs


# ---------------------------------------------------------------------------
# Stage drivers (host loops over the per-axis programs)
# ---------------------------------------------------------------------------

def _stage_1lpt(density_k, offset, dplus_1, fH_1):
    """phi1 + 1LPT lattice init, producing (4, n^2, n) column state
    (collapsed to (4, npart) by :func:`_collapse_cols` at the end)."""
    phi1_k = _density_to_phi1(density_k)
    n = phi1_k.shape[0]
    position = jnp.zeros((4, n * n, n), F32)
    velocity = jnp.zeros((4, n * n, n), F32)
    for a in range(3):
        psi = _psi_axis(phi1_k, a)
        position, velocity = _init_axis(
            a, position, velocity, psi, offset, dplus_1, fH_1
        )
        del psi
    return phi1_k, position, velocity


def _apply_nlpt(position, velocity, src_k, dplus_n, fH_n):
    for a in range(3):
        psi = _psi_axis(src_k, a)
        position, velocity = _add_axis(
            a, position, velocity, psi, dplus_n, fH_n
        )
        del psi
    return position, velocity


def _stage_2lpt(phi1_k, position, velocity, dealias, dplus_2, fH_2):
    rhs2 = compute_2ndorder_rhs(phi1_k, dealias)
    phi2_k = _invlap_of_real(rhs2)
    del rhs2
    position, velocity = _apply_nlpt(
        position, velocity, phi2_k, dplus_2, fH_2
    )
    return phi2_k, position, velocity


def _stage_3lpt_term(phi1_k, position, velocity, dealias, term,
                     phi2_k, dplus_n, fH_n):
    """One 3LPT contribution: term 'a', 'b', or 'cx'/'cy'/'cz'
    (psi = grad(invlap(rhs)), ic.py:438-439 and 645-661)."""
    if term == "a":
        rhs = compute_3a_rhs(phi1_k, dealias)
    elif term == "b":
        rhs = compute_3b_rhs(phi1_k, phi2_k, dealias)
    else:
        rhs = compute_3c_rhs(phi1_k, phi2_k, dealias, "xyz".index(term[1]))
    src_k = _invlap_of_real(rhs)
    del rhs
    position, velocity = _apply_nlpt(
        position, velocity, src_k, dplus_n, fH_n
    )
    del src_k
    return position, velocity


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def supported(param) -> bool:
    """Device IC generation covers the LPT path on the pallas engine in
    single mode with a chunk-aligned particle count (so the column state
    needs no sentinel tail). Reads param (not SolverConfig): restarts
    rewrite param inside ic.generate, so the caller cannot have built a
    config yet."""
    from .ops import pallas_pm

    ics = param["initial_conditions"]
    if isinstance(ics, (int, np.integer)) and not isinstance(ics, bool):
        return False
    engine = str(param.get("particle_engine", "pallas")).casefold()
    npart = int(param["npart"])
    return (
        "lpt" in str(ics).casefold()
        and engine == "pallas"
        and pallas_pm.padded_cols(npart) == npart
        and bool(param.get("ic_device", True))
    )


def generate_lpt(param, tables):
    """Device-side 1/2/3LPT generation; returns (position, velocity) as
    (4, npart) column-layout device arrays (wrapped), after writing the
    output_00000 snapshot exactly like the host path."""
    from time import perf_counter

    from .ops import mesh as mesh_ops
    from .utils.units import PC_M

    t0 = perf_counter()
    order = str(param["initial_conditions"]).casefold()
    a_start = 1.0 / (1 + param["z_start"])
    lna_start = np.log(a_start)
    logging.warning("z_start=%s (device IC path)", param["z_start"])
    Hz = tables[2](lna_start)
    Hz = Hz * param["unit_t"] / (1e3 * PC_M)  # km/s/Mpc -> box units
    dealias = bool(param["dealiased_ICS"])

    # host: ONLY the reference-exact raw RNG draws (order matches ic.py
    # white_noise_fourier[_fixed]: amplitudes, phases, then 7 corner
    # scalars); everything downstream of the stream -- Rayleigh map,
    # trig, Hermitian assembly, transfer multiply -- runs on the device.
    # Uploads are the raw f32 draw arrays (axon rejects complex64).
    ncells_1d = int(round(float(param["npart"]) ** (1.0 / 3.0)))
    middle = ncells_1d // 2
    seed = int(param["seed"])
    rng = (np.random.default_rng(seed) if seed >= 0
           else np.random.default_rng())
    table = jnp.asarray(ic_host.transfer_table(param, ncells_1d))
    if bool(param["fixed_ICS"]):
        phases = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=np.float32)
        logging.warning("Host RNG draw: %.1f s", perf_counter() - t0)
        shift = jnp.float32(np.pi if bool(param["paired_ICS"]) else 0.0)
        density_k = _noise_fixed_to_density_k(
            jnp.asarray(phases), shift, table
        )
    else:
        amps = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=np.float32)
        phases = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=np.float32)
        corners = rng.random(7, dtype=np.float32)
        logging.warning("Host RNG draw: %.1f s", perf_counter() - t0)
        density_k = _noise_to_density_k(
            jnp.asarray(amps), jnp.asarray(phases), jnp.asarray(corners),
            table,
        )
        del amps
    del phases
    float(jnp.sum(jnp.abs(density_k[:1, :1, :1])))  # upload+assembly barrier
    logging.warning("Upload + device noise assembly done: %.1f s",
                    perf_counter() - t0)

    dplus_1_z0 = tables[3](0)
    dplus_1 = np.float32(tables[3](lna_start) / dplus_1_z0)
    fH_1 = np.float32(tables[4](lna_start) * Hz)
    offset = np.float32(
        0.5 / round(float(param["npart"]) ** (1.0 / 3.0))
        if str(param["position_ICS"]).casefold() == "center" else 0.0
    )
    phi1_k, position, velocity = _stage_1lpt(
        density_k, offset, dplus_1, fH_1
    )
    del density_k
    logging.warning("1LPT stage issued: %.1f s", perf_counter() - t0)

    if order != "1lpt":
        logging.warning("Compute 2LPT contribution")
        dplus_2 = np.float32(tables[5](lna_start) / dplus_1_z0 ** 2)
        fH_2 = np.float32(tables[6](lna_start) * Hz)
        phi2_k, position, velocity = _stage_2lpt(
            phi1_k, position, velocity, dealias, dplus_2, fH_2
        )
        if order == "3lpt":
            terms = (
                ("a", -np.float32(tables[7](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[8](lna_start) * Hz)),
                ("b", -np.float32(tables[9](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[10](lna_start) * Hz)),
                ("cx", -np.float32(tables[11](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[12](lna_start) * Hz)),
                ("cy", -np.float32(tables[11](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[12](lna_start) * Hz)),
                ("cz", -np.float32(tables[11](lna_start) / dplus_1_z0 ** 3),
                 np.float32(tables[12](lna_start) * Hz)),
            )
            for term, dplus_n, fH_n in terms:
                logging.warning("Compute 3LPT %s contribution", term)
                position, velocity = _stage_3lpt_term(
                    phi1_k, position, velocity, dealias, term, phi2_k,
                    dplus_n, fH_n,
                )
        elif order != "2lpt":
            raise ValueError(
                f"initial_conditions={order}, should be 1LPT, 2LPT or 3LPT"
            )
        del phi2_k
    del phi1_k

    position = _collapse_cols(position)
    velocity = _collapse_cols(velocity)
    position = mesh_ops.periodic_wrap(position)
    float(jnp.sum(position[:1, :8]))  # value-fetch barrier (axon)
    logging.warning("Device IC generation: %.1f s", perf_counter() - t0)

    # initial snapshot (host write, parity with
    # ic.finalise_initial_conditions). Optional: over the tunnelled
    # backend the device->host copy runs at ~15 MB/s, so the one-time
    # 4.3 GB download at 512^3 dwarfs the generation itself.
    if bool(param.get("write_initial_snapshot", True)):
        from . import solver as solver_mod

        cfg = solver_mod.config_from_param(param)
        pos_np, vel_np = solver_mod.particles_to_rows(
            cfg, position, velocity
        )
        ic_host.finalise_initial_conditions(pos_np, vel_np, param)
        logging.warning(
            "Device IC + snapshot write: %.1f s", perf_counter() - t0
        )
    return position, velocity
