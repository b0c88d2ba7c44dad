"""Initial conditions: Gaussian random field + 1/2/3LPT, restarts, readers.

Host-side NumPy implementation (runs once per simulation, before the
device-resident run loop). The white-noise generator reproduces the
reference's exact RNG stream and Hermitian-symmetrisation write order
(``initial_conditions.py:585-732``) -- including the overlapping-plane
last-write-wins resolution and corner fixes -- so that same-seed runs
produce the same realisation as the reference (bit-exact oracle:
tests/test_rng_oracle.py; one documented deviation: the force-space
kernel wraps kz, see ``_force_kernels_upper``). LPT algebra (2LPT Hessian
source, 3LPT a/b/c terms with the rotational Ax/Ay/Az parts, Orszag 3/2
dealiasing) follows ``initial_conditions.py:976-1680``.

Spectral helpers here are small float32 NumPy mirrors of
:mod:`pysco_tpu.ops.fourier` (integer wavenumbers on rfft half grids).
"""

from __future__ import annotations

import logging
from typing import Tuple

import numpy as np

from .utils import io as iostream
from .utils.units import PC_M
from .utils.config import read_param_file

F32 = np.float32
C64 = np.complex64


# ---------------------------------------------------------------------------
# Spectral helpers (NumPy, float32, integer wavenumbers, rfft half grids)
# ---------------------------------------------------------------------------

def _wavenumbers(n: int):
    k_full = ((np.arange(n) + n // 2) % n - n // 2).astype(F32)
    kx = k_full[:, None, None]
    ky = k_full[None, :, None]
    kz = np.arange(n // 2 + 1, dtype=F32)[None, None, :]
    return kx, ky, kz


def _inverse_laplacian(xk: np.ndarray) -> np.ndarray:
    n = xk.shape[0]
    kx, ky, kz = _wavenumbers(n)
    k2 = kx * kx + ky * ky + kz * kz
    k2[0, 0, 0] = 1
    out = xk * (F32(-0.25 / np.pi ** 2) / k2)
    out[0, 0, 0] = 0
    return out.astype(C64)


def _gradient(xk: np.ndarray) -> np.ndarray:
    n = xk.shape[0]
    kx, ky, kz = _wavenumbers(n)
    tmp = np.complex64(2j * np.pi) * xk
    return np.stack((tmp * kx, tmp * ky, tmp * kz), axis=-1)


def _gradient_inverse_laplacian(xk: np.ndarray) -> np.ndarray:
    n = xk.shape[0]
    kx, ky, kz = _wavenumbers(n)
    k2 = kx * kx + ky * ky + kz * kz
    k2[0, 0, 0] = 1
    tmp = np.complex64(-1j) * (F32(0.5 / np.pi) / k2) * xk
    out = np.stack((tmp * kx, tmp * ky, tmp * kz), axis=-1)
    out[0, 0, 0, :] = 0
    return out


def _hessian(xk: np.ndarray, ij) -> np.ndarray:
    n = xk.shape[0]
    ks = _wavenumbers(n)
    return (-ks[ij[0]] * ks[ij[1]] * F32(4 * np.pi ** 2) * xk).astype(C64)


def _sum_of_hessian(xk, ij1, ij2) -> np.ndarray:
    n = xk.shape[0]
    ks = _wavenumbers(n)
    return (
        -(ks[ij1[0]] * ks[ij1[1]] + ks[ij2[0]] * ks[ij2[1]])
        * F32(4 * np.pi ** 2)
        * xk
    ).astype(C64)


def _diff_of_hessian(xk, ij1, ij2) -> np.ndarray:
    n = xk.shape[0]
    ks = _wavenumbers(n)
    return (
        -(ks[ij1[0]] * ks[ij1[1]] - ks[ij2[0]] * ks[ij2[1]])
        * F32(4 * np.pi ** 2)
        * xk
    ).astype(C64)


def _irfft(xk: np.ndarray) -> np.ndarray:
    n = xk.shape[0]
    return np.fft.irfftn(xk, s=(n, n, n), axes=(0, 1, 2)).astype(F32)


def _irfft_vec(xk: np.ndarray) -> np.ndarray:
    n = xk.shape[0]
    return np.fft.irfftn(xk, s=(n, n, n), axes=(0, 1, 2)).astype(F32)


def _rfft(x: np.ndarray) -> np.ndarray:
    return np.fft.rfftn(x).astype(C64)


def _ihess(xk, ij):
    return _irfft(_hessian(xk, ij))


# ---------------------------------------------------------------------------
# White noise (reference-exact RNG stream)
# ---------------------------------------------------------------------------

def _rayleigh(u: np.ndarray) -> np.ndarray:
    return np.sqrt(-np.log(F32(1) - u)).astype(F32)


def _hermitian_self_plane(U: np.ndarray) -> np.ndarray:
    """Resolve the overlapping upper/lower writes on the i=0 and i=middle
    planes with the reference's last-write-wins iteration order."""
    n = U.shape[0]
    j = np.arange(n)
    jp = (-j) % n
    t_up = j[:, None] * n + j[None, :]
    t_low = jp[:, None] * n + jp[None, :]
    lower = np.conj(U[jp[:, None], jp[None, :]])
    return np.where(t_low >= t_up, lower, U)


def _assemble_half_grid(U: np.ndarray) -> np.ndarray:
    """Build the rfft half grid (n, n, n//2+1) from per-plane upper draws
    U[(middle+1), n, n], applying Hermitian symmetry exactly as the
    reference's full-grid loop does."""
    middle_p1, n, _ = U.shape
    middle = middle_p1 - 1
    j = np.arange(n)
    jp = (-j) % n
    kp_half = (-np.arange(middle + 1)) % n

    out = np.empty((n, n, middle + 1), dtype=C64)
    out[0] = _hermitian_self_plane(U[0])[:, : middle + 1]
    out[middle] = _hermitian_self_plane(U[middle])[:, : middle + 1]
    for i in range(1, middle):
        out[i] = U[i][:, : middle + 1]
        out[n - i] = np.conj(U[i][jp[:, None], kp_half[None, :]])
    return out


def white_noise_fourier(ncells_1d: int, rng: np.random.Generator) -> np.ndarray:
    """Rayleigh-amplitude Hermitian white noise on the rfft half grid."""
    middle = ncells_1d // 2
    rng_amplitudes = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=F32)
    rng_phases = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=F32)
    phase = F32(2 * np.pi) * rng_phases
    amplitude = _rayleigh(rng_amplitudes)
    U = (amplitude * np.cos(phase) + 1j * (amplitude * np.sin(phase))).astype(C64)
    out = _assemble_half_grid(U)
    # corner fixes, exact draw order (initial_conditions.py:637-658)
    out[0, 0, 0] = 0
    for idx in (
        (0, 0, middle),
        (0, middle, 0),
        (0, middle, middle),
        (middle, 0, 0),
        (middle, 0, middle),
        (middle, middle, 0),
        (middle, middle, middle),
    ):
        out[idx] = _rayleigh(rng.random(dtype=F32))
    return out


def white_noise_fourier_fixed(
    ncells_1d: int, rng: np.random.Generator, is_paired: bool
) -> np.ndarray:
    """Unit-amplitude ("fixed") variant, optionally phase-shifted by pi."""
    middle = ncells_1d // 2
    rng_phases = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=F32)
    shift = F32(np.pi) if is_paired else F32(0)
    phase = F32(2 * np.pi) * rng_phases + shift
    U = (np.cos(phase) + 1j * np.sin(phase)).astype(C64)
    out = _assemble_half_grid(U)
    out[0, 0, 0] = 0
    for idx in (
        (0, 0, middle),
        (0, middle, 0),
        (0, middle, middle),
        (middle, 0, 0),
        (middle, 0, middle),
        (middle, middle, 0),
        (middle, middle, middle),
    ):
        out[idx] = 1
    return out


def _force_kernels_upper(ncells_1d: int):
    """Per-axis spectral displacement kernels g_a(k) = -i k_a/(2 pi k^2)
    evaluated on the upper half-space (x-plane <= middle, full y/z).

    Deliberate deviation from the reference: kz is WRAPPED to the
    fftfreq convention (kz = k - n for k >= n/2) like kx/ky, where the
    reference uses the raw index (``kz = np.float32(k)``,
    initial_conditions.py:782) -- giving the negative-frequency
    z-columns (half of all modes) a kernel with the wrong magnitude and
    sign (e.g. k=15 at n=16: |g| ~ 1/15 instead of 1, sign flipped).
    The RNG *stream* is still consumed identically; only the kernel
    applied to those draws differs. Pinned bit-exactly against an
    independent scalar-loop oracle in tests/test_rng_oracle.py."""
    middle = ncells_1d // 2
    k_full = ((np.arange(ncells_1d) + middle) % ncells_1d - middle).astype(F32)
    kx = k_full[: middle + 1][:, None, None]
    ky = k_full[None, :, None]
    kz = k_full[None, None, :]
    k2 = kx * kx + ky * ky + kz * kz
    k2[0, 0, 0] = 1
    base = np.complex64(-1j) * (F32(0.5 / np.pi) / k2)
    return base * kx, base * ky, base * kz


def _force_edge_fixes(force: np.ndarray, middle: int, draws) -> None:
    """Apply the reference's edge/corner assignments for force-space noise
    (initial_conditions.py:826-905). ``draws`` yields scalar amplitudes in
    the reference's order."""
    twopi = np.float32(2 * np.pi)
    invkmiddle = -np.float32(1.0 / (twopi * middle))
    f110 = invkmiddle * 0.5 * next(draws)
    f011 = invkmiddle * 0.5 * next(draws)
    f101 = invkmiddle * 0.5 * next(draws)
    f111 = invkmiddle * (1.0 / 3.0) * next(draws)
    m = middle
    force[0, 0, 0, :] = 0
    force[0, m, 0, 0] = 0
    force[0, 0, m, 0] = 0
    force[0, m, m, 0] = 0
    force[m, 0, 0, 1] = 0
    force[0, 0, m, 1] = 0
    force[m, 0, m, 1] = 0
    force[m, 0, 0, 2] = 0
    force[0, m, 0, 2] = 0
    force[m, m, 0, 2] = 0
    force[m, 0, 0, 0] = invkmiddle * next(draws)
    force[0, m, 0, 1] = invkmiddle * next(draws)
    force[0, 0, m, 2] = invkmiddle * next(draws)
    force[m, m, 0, 0] = f110
    force[m, 0, m, 0] = f101
    force[m, m, 0, 1] = f110
    force[0, m, m, 1] = f011
    force[0, m, m, 2] = f011
    force[m, m, m, :] = f111


def white_noise_fourier_force(
    ncells_1d: int, rng: np.random.Generator
) -> np.ndarray:
    """Rayleigh white noise mapped directly to the displacement field
    (N, N, N//2+1, 3); same RNG stream as the reference's
    ``white_noise_fourier_force`` (initial_conditions.py:732-905)."""
    middle = ncells_1d // 2
    rng_amplitudes = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=F32)
    rng_phases = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=F32)
    phase = F32(2 * np.pi) * rng_phases
    amplitude = _rayleigh(rng_amplitudes)
    U = (amplitude * np.cos(phase) + 1j * (amplitude * np.sin(phase))).astype(C64)
    gs = _force_kernels_upper(ncells_1d)
    force = np.empty((ncells_1d, ncells_1d, middle + 1, 3), dtype=C64)
    for a in range(3):
        # g_a is indexed by the source wavenumber; multiply the upper-space
        # draws then Hermitian-assemble exactly like the density field
        force[..., a] = _assemble_half_grid((gs[a] * U).astype(C64))
    draws = iter(_rayleigh(rng.random(7, dtype=F32)))
    _force_edge_fixes(force, middle, draws)
    return force


def white_noise_fourier_fixed_force(
    ncells_1d: int, rng: np.random.Generator, is_paired: bool
) -> np.ndarray:
    """Unit-amplitude force-space noise (initial_conditions.py:868-972)."""
    middle = ncells_1d // 2
    rng_phases = rng.random((middle + 1, ncells_1d, ncells_1d), dtype=F32)
    shift = F32(np.pi) if is_paired else F32(0)
    phase = F32(2 * np.pi) * rng_phases + shift
    U = (np.cos(phase) + 1j * np.sin(phase)).astype(C64)
    gs = _force_kernels_upper(ncells_1d)
    force = np.empty((ncells_1d, ncells_1d, middle + 1, 3), dtype=C64)
    for a in range(3):
        force[..., a] = _assemble_half_grid((gs[a] * U).astype(C64))
    draws = iter(np.ones(7, dtype=F32))
    _force_edge_fixes(force, middle, draws)
    return force


def generate_force(param) -> np.ndarray:
    """Displacement field directly from force-space white noise
    (reference ``generate_force``, initial_conditions.py:338-399)."""
    transfer_grid = get_transfer_grid(param)
    ncells_1d = int(round(float(param["npart"]) ** (1.0 / 3.0)))
    seed = int(param["seed"])
    rng = np.random.default_rng(seed) if seed >= 0 else np.random.default_rng()
    if param["fixed_ICS"]:
        force = white_noise_fourier_fixed_force(
            ncells_1d, rng, bool(param["paired_ICS"])
        )
    else:
        force = white_noise_fourier_force(ncells_1d, rng)
    force = force * transfer_grid[..., None]
    return _irfft_vec(force.astype(C64))


def transfer_table(param, ncells_1d: int) -> np.ndarray:
    """sqrt(P(k)) per unique integer |k|^2 value (grid units): |k|^2 is an
    exact small integer (components in [-n/2, n/2]), so interpolating once
    per value (<= 3n^2/4 entries) and gathering is bit-identical to the
    per-cell np.interp at a fraction of the cost."""
    k, Pk = np.loadtxt(param["power_spectrum_file"]).T
    kf = 2 * np.pi / param["boxlen"]
    k_dimensionless = k / kf
    sqrtPk = (np.sqrt(Pk / param["boxlen"] ** 3) * ncells_1d ** 3).astype(F32)
    half = ncells_1d // 2
    return np.interp(
        np.sqrt(np.arange(3 * half * half + 1, dtype=F32)),
        k_dimensionless, sqrtPk,
    ).astype(F32)


def get_transfer_grid(param) -> np.ndarray:
    """sqrt(P(k)) interpolated onto the |k| half grid (in grid units)."""
    ncells_1d = int(round(float(param["npart"]) ** (1.0 / 3.0)))
    if param["npart"] != ncells_1d ** 3:
        raise ValueError(f"npart={param['npart']} must be a perfect cube")
    # Integer k2 is built in intp directly: on this image's low-bandwidth
    # host every extra 67M-element pass (an astype, np.take) costs ~2 s
    # at 512^3.
    half = ncells_1d // 2
    table = transfer_table(param, ncells_1d)
    ki = ((np.arange(ncells_1d) + half) % ncells_1d - half).astype(np.intp)
    k2 = (
        (ki * ki)[:, None, None]
        + (ki * ki)[None, :, None]
        + (np.arange(half + 1, dtype=np.intp) ** 2)[None, None, :]
    )
    return table[k2]


def generate_density_fourier(param) -> np.ndarray:
    transfer_grid = get_transfer_grid(param)
    ncells_1d = int(round(float(param["npart"]) ** (1.0 / 3.0)))
    seed = int(param["seed"])
    rng = np.random.default_rng(seed) if seed >= 0 else np.random.default_rng()
    if param["fixed_ICS"]:
        density_k = white_noise_fourier_fixed(ncells_1d, rng, bool(param["paired_ICS"]))
    else:
        density_k = white_noise_fourier(ncells_1d, rng)
    return (density_k * transfer_grid).astype(C64)


# ---------------------------------------------------------------------------
# Orszag 3/2 dealiasing
# ---------------------------------------------------------------------------

def pad(x: np.ndarray) -> np.ndarray:
    """Zero-pad an rfft half grid to 3N/2 (initial_conditions.py:1859)."""
    n = x.shape[0]
    ne = 3 * n // 2
    middle = n // 2
    out = np.zeros((ne, ne, ne // 2 + 1), dtype=x.dtype)
    out[:middle, :middle, :middle] = x[:middle, :middle, :middle]
    out[-middle + 1:, :middle, :middle] = x[-middle + 1:, :middle, :middle]
    out[:middle, -middle + 1:, :middle] = x[:middle, -middle + 1:, :middle]
    out[-middle + 1:, -middle + 1:, :middle] = x[-middle + 1:, -middle + 1:, :middle]
    return out


def trim(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pad` (initial_conditions.py:1897)."""
    ne = x.shape[0]
    n = 2 * ne // 3
    middle = n // 2
    out = np.zeros((n, n, middle + 1), dtype=x.dtype)
    out[:middle, :middle, :middle] = x[:middle, :middle, :middle]
    out[-middle + 1:, :middle, :middle] = x[-middle + 1:, :middle, :middle]
    out[:middle, -middle + 1:, :middle] = x[:middle, -middle + 1:, :middle]
    out[-middle + 1:, -middle + 1:, :middle] = x[-middle + 1:, -middle + 1:, :middle]
    return out


def _maybe_dealias_in(param, *grids):
    if param["dealiased_ICS"]:
        return tuple(pad(g) for g in grids)
    return grids


def _maybe_dealias_out(param, rhs: np.ndarray, rescale: float) -> np.ndarray:
    if param["dealiased_ICS"]:
        rhs_k = trim(_rfft(rhs))
        return _irfft(rhs_k) * F32(rescale)
    return rhs


# ---------------------------------------------------------------------------
# LPT sources
# ---------------------------------------------------------------------------

def compute_2ndorder_rhs(phi1_k: np.ndarray, param) -> np.ndarray:
    (p1,) = _maybe_dealias_in(param, phi1_k)
    rhs = _ihess(p1, (0, 0)) * _irfft(_sum_of_hessian(p1, (1, 1), (2, 2)))
    rhs += _ihess(p1, (1, 1)) * _ihess(p1, (2, 2))
    rhs -= _ihess(p1, (0, 1)) ** 2
    rhs -= _ihess(p1, (0, 2)) ** 2
    rhs -= _ihess(p1, (1, 2)) ** 2
    return _maybe_dealias_out(param, rhs, 1.5 ** 3)


def compute_3a_rhs(phi1_k: np.ndarray, param) -> np.ndarray:
    (p1,) = _maybe_dealias_in(param, phi1_k)
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
    return _maybe_dealias_out(param, rhs, 1.5 ** 6)


def compute_3b_rhs(phi1_k: np.ndarray, phi2_k: np.ndarray, param) -> np.ndarray:
    p1, p2 = _maybe_dealias_in(param, phi1_k, phi2_k)
    half = F32(0.5)
    rhs = half * _ihess(p1, (0, 0)) * _irfft(_sum_of_hessian(p2, (1, 1), (2, 2)))
    rhs += half * _ihess(p1, (1, 1)) * _irfft(_sum_of_hessian(p2, (0, 0), (2, 2)))
    rhs += half * _ihess(p1, (2, 2)) * _irfft(_sum_of_hessian(p2, (0, 0), (1, 1)))
    rhs -= _ihess(p1, (0, 1)) * _ihess(p2, (0, 1))
    rhs -= _ihess(p1, (0, 2)) * _ihess(p2, (0, 2))
    rhs -= _ihess(p1, (1, 2)) * _ihess(p2, (1, 2))
    return _maybe_dealias_out(param, rhs, 1.5 ** 3)


def compute_3c_rhs(phi1_k, phi2_k, param, component: int) -> np.ndarray:
    """Rotational 3LPT source A_x/A_y/A_z (component 0/1/2)."""
    p1, p2 = _maybe_dealias_in(param, phi1_k, phi2_k)
    if component == 0:
        rhs = _ihess(p1, (0, 2)) * _ihess(p2, (0, 1))
        rhs -= _ihess(p2, (0, 2)) * _ihess(p1, (0, 1))
        rhs += _ihess(p1, (1, 2)) * _irfft(_diff_of_hessian(p2, (1, 1), (2, 2)))
        rhs -= _ihess(p2, (1, 2)) * _irfft(_diff_of_hessian(p1, (1, 1), (2, 2)))
    elif component == 1:
        rhs = _ihess(p1, (0, 1)) * _ihess(p2, (1, 2))
        rhs -= _ihess(p2, (0, 1)) * _ihess(p1, (1, 2))
        rhs += _ihess(p1, (0, 2)) * _irfft(_diff_of_hessian(p2, (2, 2), (0, 0)))
        rhs -= _ihess(p2, (0, 2)) * _irfft(_diff_of_hessian(p1, (2, 2), (0, 0)))
    else:
        rhs = _ihess(p1, (1, 2)) * _ihess(p2, (0, 2))
        rhs -= _ihess(p2, (1, 2)) * _ihess(p1, (0, 2))
        rhs += _ihess(p1, (0, 1)) * _irfft(_diff_of_hessian(p2, (0, 0), (1, 1)))
        rhs -= _ihess(p2, (0, 1)) * _irfft(_diff_of_hessian(p1, (0, 0), (1, 1)))
    return _maybe_dealias_out(param, rhs, 1.5 ** 3)


def _displacement_from_rhs(rhs: np.ndarray) -> np.ndarray:
    return _irfft_vec(_gradient_inverse_laplacian(_rfft(rhs)))


# ---------------------------------------------------------------------------
# Particle initialisation
# ---------------------------------------------------------------------------

def initialise_1LPT(psi: np.ndarray, dplus_1: float, fH: float, param):
    n = psi.shape[0]
    h = F32(1.0 / n)
    offset = F32(0.5 / n) if str(param["position_ICS"]).casefold() == "center" else F32(0)
    coords = (np.arange(n, dtype=F32) * h + offset)
    dplus_1 = F32(dplus_1)
    dfH = F32(dplus_1 * F32(fH))
    position = -dplus_1 * psi
    position[..., 0] += coords[:, None, None]
    position[..., 1] += coords[None, :, None]
    position[..., 2] += coords[None, None, :]
    velocity = -dfH * psi
    return position, velocity


def add_nLPT(position, velocity, psi, dplus_n: float, fH_n: float) -> None:
    dplus_n = F32(dplus_n)
    dfH = F32(dplus_n * F32(fH_n))
    position += dplus_n * psi
    velocity += dfH * psi


def _wrap_host(position: np.ndarray) -> np.ndarray:
    eps = F32(-(0.5 ** 25) * (1.0 + 1e-6))
    x = position
    x = np.where((x < 0) & (x > eps), F32(0), x)
    x = np.where(x < 0, x + F32(1), x)
    x = np.where(x >= 1, x - F32(1), x)
    return x


def finalise_initial_conditions(position, velocity, param) -> Tuple[np.ndarray, np.ndarray]:
    position = _wrap_host(position)
    fmt = str(param["output_snapshot_format"]).casefold()
    if fmt == "parquet":
        snap_name = f"{param['base']}/output_00000/particles_{param['extra']}.parquet"
        iostream.write_snapshot_particles_parquet(snap_name, position, velocity)
        iostream.write_param_txt(
            f"{param['base']}/output_00000/param_{param['extra']}.txt", param
        )
    elif fmt == "hdf5":
        snap_name = f"{param['base']}/output_00000/particles_{param['extra']}.h5"
        iostream.write_snapshot_particles_hdf5(snap_name, position, velocity, param)
    else:
        raise NotImplementedError(fmt)
    logging.warning("Write initial snapshot %s", snap_name)
    return position, velocity


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def generate(param, tables) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatch on ``initial_conditions``: LPT order, restart number, or
    external snapshot files (initial_conditions.py:25-213)."""
    ICS = param["initial_conditions"]
    if isinstance(ICS, (int, np.integer)) and not isinstance(ICS, bool):
        return _restart(param, int(ICS))
    ics_str = str(ICS)
    if "lpt" in ics_str.casefold():
        return _generate_lpt(param, tables, ics_str.casefold())
    if ics_str.casefold().endswith(".h5"):
        position, velocity = _read_raygal_hdf5(param)
        return finalise_initial_conditions(position, velocity, param)
    # anything else is assumed to be a Gadget snapshot, as in the reference
    position, velocity = _read_gadget(param)
    return finalise_initial_conditions(position, velocity, param)


def _restart(param, i_restart: int):
    fmt = str(param["output_snapshot_format"]).casefold()
    if fmt == "parquet":
        filename = (
            f"{param['base']}/output_{i_restart:05d}/particles_{param['extra']}.parquet"
        )
        position, velocity = iostream.read_snapshot_particles_parquet(filename)
        param_filename = (
            f"{param['base']}/output_{i_restart:05d}/"
            f"param_{param['extra']}_{i_restart:05d}.txt"
        )
        param_restart = read_param_file(param_filename)
        for key, value in param_restart.items():
            if key.casefold() != "nthreads":
                param[key] = value
    elif fmt == "hdf5":
        filename = f"{param['base']}/output_{i_restart:05d}/particles_{param['extra']}.h5"
        position, velocity = iostream.read_snapshot_particles_hdf5(filename)
        for key, value in iostream.read_hdf5_snapshot_attrs(filename).items():
            if key.casefold() != "nthreads":
                param[key] = value
    else:
        raise NotImplementedError(fmt)
    param["initial_conditions"] = i_restart
    return position, velocity


def _read_raygal_hdf5(param):
    """RayGal/Ramses HDF5 reader (initial_conditions.py:283-338)."""
    import h5py

    from .utils.units import set_units

    filename = str(param["initial_conditions"])
    logging.warning("Read %s", filename)
    with h5py.File(filename, "r") as f:
        param["aexp"] = float(f["metadata/ramses_info"].attrs["aexp"][0])
        set_units(param)
        npart = int(f["metadata/npart_file"][()])
        if npart != param["npart"]:
            raise ValueError(f"{npart=} and {param['npart']=} should be equal.")
        position = np.empty((npart, 3), dtype=F32)
        velocity = np.empty_like(position)
        npart_grp_array = f["metadata/npart_grp_array"][:]
        data = f["data"]
        istart = 0
        for i in range(npart_grp_array.shape[0]):
            name = f"group{(i + 1):08d}"
            cnt = npart_grp_array[i]
            position[istart:istart + cnt] = data[name + "/position_part"][:]
            velocity[istart:istart + cnt] = data[name + "/velocity_part"][:]
            istart += cnt
    return position, velocity


def _read_gadget(param):
    """Gadget snapshot reader (initial_conditions.py:338-399 semantics,
    self-contained reader instead of Pylians' readgadget)."""
    from .utils import gadget
    from .utils.units import set_units

    filename = str(param["initial_conditions"])
    logging.warning("Read %s", filename)
    header = gadget.read_header(filename)
    param["aexp"] = 1.0 / (1 + header.redshift)
    param["z_start"] = header.redshift
    logging.warning("Initial redshift snapshot at z = %s", header.redshift)
    set_units(param)

    npart = int(header.npart_total[1])
    if npart != param["npart"]:
        raise ValueError(f"{npart=} and {param['npart']=} should be equal.")
    if not np.allclose(
        [header.omega_m, header.omega_l, 100 * header.hubble],
        [param["Om_m"], param["Om_lambda"], param["H0"]],
    ):
        raise ValueError(
            f"Cosmology mismatch: {header.omega_m=} {param['Om_m']=} "
            f"{(100 * header.hubble)=} {param['H0']=}"
        )

    position, velocity = gadget.read_particles(filename, ptype=1)
    position = (position * F32(1.0 / header.boxsize)).astype(F32)
    vel_factor = F32(param["unit_t"] / param["unit_l"])
    velocity = (velocity * vel_factor).astype(F32)
    return position, velocity


def _generate_lpt(param, tables, order: str):
    a_start = 1.0 / (1 + param["z_start"])
    lna_start = np.log(a_start)
    logging.warning("z_start=%s", param["z_start"])
    Hz = tables[2](lna_start)
    mpc_to_km = 1e3 * PC_M
    Hz = Hz * param["unit_t"] / mpc_to_km  # km/s/Mpc -> box units

    density_k = generate_density_fourier(param)
    phi1_k = _inverse_laplacian(density_k)
    del density_k
    psi_1lpt = _irfft_vec(_gradient(phi1_k))

    dplus_1_z0 = tables[3](0)
    dplus_1 = F32(tables[3](lna_start) / dplus_1_z0)
    fH_1 = F32(tables[4](lna_start) * Hz)
    position, velocity = initialise_1LPT(psi_1lpt, dplus_1, fH_1, param)
    del psi_1lpt
    npart = int(param["npart"])
    if order == "1lpt":
        return finalise_initial_conditions(
            position.reshape(npart, 3), velocity.reshape(npart, 3), param
        )

    logging.warning("Compute 2LPT contribution")
    rhs2 = compute_2ndorder_rhs(phi1_k, param)
    phi2_k = _inverse_laplacian(_rfft(rhs2))
    del rhs2
    psi_2lpt = _irfft_vec(_gradient(phi2_k))
    dplus_2 = F32(tables[5](lna_start) / dplus_1_z0 ** 2)
    fH_2 = F32(tables[6](lna_start) * Hz)
    add_nLPT(position, velocity, psi_2lpt, dplus_2, fH_2)
    del psi_2lpt
    if order == "2lpt":
        return finalise_initial_conditions(
            position.reshape(npart, 3), velocity.reshape(npart, 3), param
        )

    if order != "3lpt":
        raise ValueError(f"initial_conditions={order}, should be 1LPT, 2LPT or 3LPT")

    dplus_3a = -F32(tables[7](lna_start) / dplus_1_z0 ** 3)
    fH_3a = F32(tables[8](lna_start) * Hz)
    dplus_3b = -F32(tables[9](lna_start) / dplus_1_z0 ** 3)
    fH_3b = F32(tables[10](lna_start) * Hz)
    dplus_3c = -F32(tables[11](lna_start) / dplus_1_z0 ** 3)
    fH_3c = F32(tables[12](lna_start) * Hz)

    logging.warning("Compute 3LPT a) contribution")
    psi = _displacement_from_rhs(compute_3a_rhs(phi1_k, param))
    add_nLPT(position, velocity, psi, dplus_3a, fH_3a)
    logging.warning("Compute 3LPT b) contribution")
    psi = _displacement_from_rhs(compute_3b_rhs(phi1_k, phi2_k, param))
    add_nLPT(position, velocity, psi, dplus_3b, fH_3b)
    for comp, name in enumerate("xyz"):
        logging.warning("Compute 3LPT c) A%s contribution", name)
        psi = _displacement_from_rhs(compute_3c_rhs(phi1_k, phi2_k, param, comp))
        add_nLPT(position, velocity, psi, dplus_3c, fH_3c)
    del psi
    return finalise_initial_conditions(
        position.reshape(npart, 3), velocity.reshape(npart, 3), param
    )
