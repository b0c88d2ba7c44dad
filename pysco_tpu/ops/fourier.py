"""Spectral operators on rfft half-grids.

TPU-native replacement for the reference's handwritten k-space loop kernels
(``fourier.py``): here every kernel is a fused elementwise jnp expression on
the ``(N, N, N//2+1)`` complex64 rfft grid, traced once under jit so XLA
fuses wavenumber generation, compensation and scaling into the FFT
pre/post-passes. Wavenumbers are *integer* (cycles per box), matching the
reference convention.

Function parity map (reference ``fourier.py``):
- ``rfft3`` / ``irfft3`` / ``irfft3_vec``  <->  fft_3D_real (:104),
  ifft_3D_real (:251), ifft_3D_real_grad (:343)
- ``inverse_laplacian`` (:460), ``inverse_laplacian_compensated`` (:502,
  Jing 2005), ``inverse_laplacian_7pt`` (:555, Feng et al. 2016)
- ``gradient_inverse_laplacian[_compensated]`` (:606, :664)
- ``gradient`` (:730), ``hessian`` (:784), ``sum_of_hessian`` (:842),
  ``diff_of_hessian`` (:907)
- ``power_spectrum``  <->  fourier_grid_to_Pk (:22)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

F32 = jnp.float32
C64 = jnp.complex64


def rfft3(x: jax.Array) -> jax.Array:
    """3D real-to-complex FFT, float32 -> complex64 half grid."""
    return jnp.fft.rfftn(x.astype(F32)).astype(C64)


def irfft3(xk: jax.Array) -> jax.Array:
    """3D complex-to-real inverse FFT on an (N, N, N//2+1) half grid."""
    n = xk.shape[0]
    return jnp.fft.irfftn(xk, s=(n, n, n)).astype(F32)


def irfft3_vec(xk: jax.Array) -> jax.Array:
    """Inverse FFT of a vector field (N, N, N//2+1, 3) -> (N, N, N, 3)."""
    n = xk.shape[0]
    return jnp.fft.irfftn(xk, s=(n, n, n), axes=(0, 1, 2)).astype(F32)


def fft3(x: jax.Array) -> jax.Array:
    """Complex-to-complex 3D FFT (reference fft_3D, fourier.py:157)."""
    return jnp.fft.fftn(x.astype(C64), axes=(0, 1, 2)).astype(C64)


def ifft3(xk: jax.Array) -> jax.Array:
    """Complex-to-complex inverse 3D FFT (reference ifft_3D)."""
    return jnp.fft.ifftn(xk, axes=(0, 1, 2)).astype(C64)


def fft3_vec(x: jax.Array) -> jax.Array:
    """Componentwise complex FFT of (N, N, N, C) (reference fft_3D_grad)."""
    return jnp.fft.fftn(x.astype(C64), axes=(0, 1, 2)).astype(C64)


def ifft3_vec(xk: jax.Array) -> jax.Array:
    """Componentwise complex inverse FFT (reference ifft_3D_grad)."""
    return jnp.fft.ifftn(xk, axes=(0, 1, 2)).astype(C64)


def _wavenumbers(n: int):
    """Integer wavenumbers for an (n, n, n//2+1) half grid.

    Returns broadcast-ready (kx, ky, kz) with kx, ky in [-n/2, n/2) and
    kz in [0, n/2].
    """
    k_full = (jnp.arange(n, dtype=jnp.int32) + n // 2) % n - n // 2
    kx = k_full.astype(F32)[:, None, None]
    ky = k_full.astype(F32)[None, :, None]
    kz = jnp.arange(n // 2 + 1, dtype=jnp.int32).astype(F32)[None, None, :]
    return kx, ky, kz


def _k2(n: int):
    kx, ky, kz = _wavenumbers(n)
    return kx * kx + ky * ky + kz * kz


def _sinc_weight(n: int):
    """Product of per-axis sinc mass-assignment window functions."""
    h = F32(1.0 / n)
    kx, ky, kz = _wavenumbers(n)
    return jnp.sinc(kx * h) * jnp.sinc(ky * h) * jnp.sinc(kz * h)


def _zero_dc(xk: jax.Array) -> jax.Array:
    return xk.at[0, 0, 0].set(0)


def inverse_laplacian(xk: jax.Array) -> jax.Array:
    """Multiply by -1/(4 pi^2 k^2); DC mode zeroed."""
    n = xk.shape[0]
    minus_inv_fourpi2 = F32(-0.25 / jnp.pi ** 2)
    k2 = _k2(n)
    k2 = k2.at[0, 0, 0].set(F32(1))
    return _zero_dc(xk * (minus_inv_fourpi2 / k2))


def inverse_laplacian_compensated(xk: jax.Array, p: int) -> jax.Array:
    """Inverse Laplacian with Jing (2005) deconvolution of the MAS window."""
    n = xk.shape[0]
    minus_inv_fourpi2 = F32(-0.25 / jnp.pi ** 2)
    k2 = _k2(n)
    k2 = k2.at[0, 0, 0].set(F32(1))
    w = _sinc_weight(n)
    return _zero_dc(xk * (w ** (-2 * p) * minus_inv_fourpi2 / k2))


def inverse_laplacian_7pt(xk: jax.Array) -> jax.Array:
    """Exact inverse of the discrete 7-point Laplacian in k-space."""
    n = xk.shape[0]
    pi_h = F32(jnp.pi / n)
    h = F32(1.0 / n)
    minus_h2_inv4 = F32(-0.25 * h * h)
    kx, ky, kz = _wavenumbers(n)
    f = (
        jnp.sin(pi_h * kx) ** 2
        + jnp.sin(pi_h * ky) ** 2
        + jnp.sin(pi_h * kz) ** 2
    )
    f = f.at[0, 0, 0].set(F32(1))
    return _zero_dc(xk * (minus_h2_inv4 / f))


def gradient(xk: jax.Array) -> jax.Array:
    """Spectral gradient: i*2pi*k_n x. Output (N, N, N//2+1, 3)."""
    n = xk.shape[0]
    twopi_i = jnp.complex64(2j * jnp.pi)
    kx, ky, kz = _wavenumbers(n)
    tmp = twopi_i * xk
    return jnp.stack((tmp * kx, tmp * ky, tmp * kz), axis=-1)


def _gradient_inverse_laplacian_from_ratio(xk: jax.Array, ratio: jax.Array):
    n = xk.shape[0]
    kx, ky, kz = _wavenumbers(n)
    tmp = jnp.complex64(-1j) * ratio * xk
    out = jnp.stack((tmp * kx, tmp * ky, tmp * kz), axis=-1)
    return out.at[0, 0, 0, :].set(0)


def gradient_inverse_laplacian(xk: jax.Array) -> jax.Array:
    """-i k_n / (2 pi k^2) x: spectral displacement/force kernel."""
    n = xk.shape[0]
    invtwopi = F32(0.5 / jnp.pi)
    k2 = _k2(n)
    k2 = k2.at[0, 0, 0].set(F32(1))
    return _gradient_inverse_laplacian_from_ratio(xk, invtwopi / k2)


def gradient_inverse_laplacian_compensated(xk: jax.Array, p: int) -> jax.Array:
    n = xk.shape[0]
    invtwopi = F32(0.5 / jnp.pi)
    k2 = _k2(n)
    k2 = k2.at[0, 0, 0].set(F32(1))
    w = _sinc_weight(n)
    return _gradient_inverse_laplacian_from_ratio(xk, w ** (-2 * p) * invtwopi / k2)


def hessian(xk: jax.Array, ij) -> jax.Array:
    """Second derivative kernel: -4 pi^2 k_n k_m x."""
    n = xk.shape[0]
    fourpi2 = F32(4 * jnp.pi ** 2)
    ks = _wavenumbers(n)
    return -ks[ij[0]] * ks[ij[1]] * fourpi2 * xk


def sum_of_hessian(xk: jax.Array, ij1, ij2) -> jax.Array:
    n = xk.shape[0]
    fourpi2 = F32(4 * jnp.pi ** 2)
    ks = _wavenumbers(n)
    return -(ks[ij1[0]] * ks[ij1[1]] + ks[ij2[0]] * ks[ij2[1]]) * fourpi2 * xk


def diff_of_hessian(xk: jax.Array, ij1, ij2) -> jax.Array:
    n = xk.shape[0]
    fourpi2 = F32(4 * jnp.pi ** 2)
    ks = _wavenumbers(n)
    return -(ks[ij1[0]] * ks[ij1[1]] - ks[ij2[0]] * ks[ij2[1]]) * fourpi2 * xk


@partial(jax.jit, static_argnums=(1,))
def power_spectrum(xk: jax.Array, p: int):
    """Binned power spectrum of an rfft half grid with sinc^-p compensation.

    Bins |delta(k)|^2 by round(|k|) up to the Orszag 2/3 Nyquist cutoff,
    spanning only the half grid (each mode counted once), exactly like the
    reference estimator (fourier.py:22-100). Returns (k, Pk, Nmodes) in
    grid units; the caller applies box normalisation.
    """
    n = xk.shape[0]
    middle = n // 2
    kx, ky, kz = _wavenumbers(n)
    k_norm = jnp.sqrt(kx * kx + ky * ky + kz * kz)
    k_index = (k_norm + F32(0.5)).astype(jnp.int32)
    if p != 0:
        w = _sinc_weight(n)
        amp = xk * w ** (-p)
    else:
        amp = xk
    delta2 = amp.real ** 2 + amp.imag ** 2
    delta2 = delta2.at[0, 0, 0].set(F32(0))
    idx = k_index.ravel()
    nbins = n
    ones = jnp.ones_like(idx, dtype=F32).at[0].set(F32(0))
    nmodes = jnp.zeros((nbins,), F32).at[idx].add(ones)
    ksum = jnp.zeros((nbins,), F32).at[idx].add((k_norm.ravel()) * ones)
    pksum = jnp.zeros((nbins,), F32).at[idx].add(delta2.ravel())
    kmax = int(2 * middle / 3)
    sl = slice(1, kmax)
    return ksum[sl] / nmodes[sl], pksum[sl] / nmodes[sl], nmodes[sl]
