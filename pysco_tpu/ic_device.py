"""On-device LPT initial conditions.

The host keeps ONLY the reference-exact RNG draw and Hermitian assembly
(:mod:`pysco_tpu.ic` ``white_noise_*`` -- bit-parity with the reference
stream, initial_conditions.py:585-732); the uploaded white-noise half
grid then flows through the :mod:`pysco_tpu.ops.fourier` kernels on the
device: inverse Laplacians, spectral gradients, Hessian products for the
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


def _ihess(xk, ij):
    return fourier.irfft3(fourier.hessian(xk, ij))


def _maybe_pad(dealias: bool, *grids):
    return tuple(pad_k(g) for g in grids) if dealias else grids


def _maybe_trim(dealias: bool, rhs, rescale: float):
    if dealias:
        return fourier.irfft3(trim_k(fourier.rfft3(rhs))) * F32(rescale)
    return rhs


# ---------------------------------------------------------------------------
# LPT sources (ic.py:379-435 on device)
# ---------------------------------------------------------------------------

def compute_2ndorder_rhs(phi1_k, dealias: bool):
    (p1,) = _maybe_pad(dealias, phi1_k)
    rhs = _ihess(p1, (0, 0)) * fourier.irfft3(
        fourier.sum_of_hessian(p1, (1, 1), (2, 2))
    )
    rhs += _ihess(p1, (1, 1)) * _ihess(p1, (2, 2))
    rhs -= _ihess(p1, (0, 1)) ** 2
    rhs -= _ihess(p1, (0, 2)) ** 2
    rhs -= _ihess(p1, (1, 2)) ** 2
    return _maybe_trim(dealias, rhs, 1.5 ** 3)


def compute_3a_rhs(phi1_k, dealias: bool):
    (p1,) = _maybe_pad(dealias, phi1_k)
    h01 = _ihess(p1, (0, 1))
    h02 = _ihess(p1, (0, 2))
    h12 = _ihess(p1, (1, 2))
    h00 = _ihess(p1, (0, 0))
    h11 = _ihess(p1, (1, 1))
    h22 = _ihess(p1, (2, 2))
    rhs = h00 * h11 * h22
    rhs += F32(2) * h01 * h02 * h12
    rhs -= h12 * h12 * h00
    rhs -= h02 * h02 * h11
    rhs -= h01 * h01 * h22
    return _maybe_trim(dealias, rhs, 1.5 ** 6)


def compute_3b_rhs(phi1_k, phi2_k, dealias: bool):
    p1, p2 = _maybe_pad(dealias, phi1_k, phi2_k)
    half = F32(0.5)
    rhs = half * _ihess(p1, (0, 0)) * fourier.irfft3(
        fourier.sum_of_hessian(p2, (1, 1), (2, 2))
    )
    rhs += half * _ihess(p1, (1, 1)) * fourier.irfft3(
        fourier.sum_of_hessian(p2, (0, 0), (2, 2))
    )
    rhs += half * _ihess(p1, (2, 2)) * fourier.irfft3(
        fourier.sum_of_hessian(p2, (0, 0), (1, 1))
    )
    rhs -= _ihess(p1, (0, 1)) * _ihess(p2, (0, 1))
    rhs -= _ihess(p1, (0, 2)) * _ihess(p2, (0, 2))
    rhs -= _ihess(p1, (1, 2)) * _ihess(p2, (1, 2))
    return _maybe_trim(dealias, rhs, 1.5 ** 3)


def compute_3c_rhs(phi1_k, phi2_k, dealias: bool, component: int):
    """Rotational 3LPT source A_x/A_y/A_z (ic.py:417-435)."""
    p1, p2 = _maybe_pad(dealias, phi1_k, phi2_k)
    d = fourier.diff_of_hessian
    if component == 0:
        rhs = _ihess(p1, (0, 2)) * _ihess(p2, (0, 1))
        rhs -= _ihess(p2, (0, 2)) * _ihess(p1, (0, 1))
        rhs += _ihess(p1, (1, 2)) * fourier.irfft3(d(p2, (1, 1), (2, 2)))
        rhs -= _ihess(p2, (1, 2)) * fourier.irfft3(d(p1, (1, 1), (2, 2)))
    elif component == 1:
        rhs = _ihess(p1, (0, 1)) * _ihess(p2, (1, 2))
        rhs -= _ihess(p2, (0, 1)) * _ihess(p1, (1, 2))
        rhs += _ihess(p1, (0, 2)) * fourier.irfft3(d(p2, (2, 2), (0, 0)))
        rhs -= _ihess(p2, (0, 2)) * fourier.irfft3(d(p1, (2, 2), (0, 0)))
    else:
        rhs = _ihess(p1, (1, 2)) * _ihess(p2, (0, 2))
        rhs -= _ihess(p2, (1, 2)) * _ihess(p1, (0, 2))
        rhs += _ihess(p1, (0, 1)) * fourier.irfft3(d(p2, (0, 0), (1, 1)))
        rhs -= _ihess(p2, (0, 1)) * fourier.irfft3(d(p1, (0, 0), (1, 1)))
    return _maybe_trim(dealias, rhs, 1.5 ** 3)


# ---------------------------------------------------------------------------
# Jitted stages (one XLA program per LPT order; scalars enter as f32)
# ---------------------------------------------------------------------------

def _psi_components(src_k):
    """Per-component spectral gradient -> real space, one FFT at a time
    (memory: never holds the (N, N, N, 3) stack; fourier.py:239-247)."""
    n = src_k.shape[0]
    kx, ky, kz = fourier._wavenumbers(n)
    tmp = jnp.complex64(2j * jnp.pi) * src_k
    return (
        fourier.irfft3(tmp * kx),
        fourier.irfft3(tmp * ky),
        fourier.irfft3(tmp * kz),
    )


@jax.jit
def _stage_1lpt(density_k_pair, offset, dplus_1, fH_1):
    """phi1 + 1LPT lattice init, producing (4, npart) column state
    (ic.py initialise_1LPT, reference initial_conditions.py:1688-1748).

    ``density_k_pair`` is the white-noise half grid as a float32
    (..., 2) real/imag stack: the axon backend cannot upload complex64
    host arrays (batched_device_put -> UNIMPLEMENTED), so the complex
    view is assembled on device."""
    density_k = jax.lax.complex(density_k_pair[..., 0],
                                density_k_pair[..., 1])
    phi1_k = fourier.inverse_laplacian(density_k)
    n = phi1_k.shape[0]
    h = F32(1.0 / n)
    coords = jnp.arange(n, dtype=F32) * h + offset
    dplus_1 = F32(dplus_1)
    dfH = F32(dplus_1) * F32(fH_1)
    psis = _psi_components(phi1_k)
    shapes = [(n, 1, 1), (1, n, 1), (1, 1, n)]
    pos_rows, vel_rows = [], []
    for a in range(3):
        pa = coords.reshape(shapes[a]) - dplus_1 * psis[a]
        pos_rows.append(jnp.broadcast_to(pa, (n, n, n)).reshape(-1))
        vel_rows.append((-dfH * psis[a]).reshape(-1))
    zero = jnp.zeros((n * n * n,), F32)
    return (phi1_k, jnp.stack((*pos_rows, zero)),
            jnp.stack((*vel_rows, zero)))


@partial(jax.jit, static_argnums=(3,), donate_argnums=(1, 2))
def _stage_2lpt(phi1_k, position, velocity, dealias, dplus_2, fH_2):
    rhs2 = compute_2ndorder_rhs(phi1_k, dealias)
    phi2_k = fourier.inverse_laplacian(fourier.rfft3(rhs2))
    position, velocity = _add_nlpt_cols(
        position, velocity, phi2_k, dplus_2, fH_2
    )
    return phi2_k, position, velocity


def _add_nlpt_cols(position, velocity, src_k, dplus_n, fH_n):
    """psi = grad(src) accumulated onto the column state (ic.py add_nLPT)."""
    dplus_n = F32(dplus_n)
    dfH = F32(dplus_n) * F32(fH_n)
    psis = _psi_components(src_k)
    for a in range(3):
        pa = psis[a].reshape(-1)
        position = position.at[a].add(dplus_n * pa)
        velocity = velocity.at[a].add(dfH * pa)
    return position, velocity


@partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1, 2))
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
    src_k = fourier.inverse_laplacian(fourier.rfft3(rhs))
    return _add_nlpt_cols(position, velocity, src_k, dplus_n, fH_n)


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

    # host: reference-exact RNG stream -> white noise x transfer (ic.py);
    # uploaded as a float32 real/imag stack (axon rejects complex64
    # uploads) and assembled to complex64 inside _stage_1lpt
    dk_host = ic_host.generate_density_fourier(param)
    density_k = jnp.asarray(
        np.stack((dk_host.real, dk_host.imag), axis=-1), dtype=np.float32
    )
    del dk_host

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
