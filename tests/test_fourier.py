"""Spectral kernel tests: analytic single modes and discrete-operator duals."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu.models import laplacian
from pysco_tpu.ops import fourier


def _single_mode(n, kvec, amp=1.0):
    x = np.arange(n) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    phase = 2 * np.pi * (kvec[0] * X + kvec[1] * Y + kvec[2] * Z)
    return (amp * np.cos(phase)).astype(np.float32)


def test_rfft_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.random((16, 16, 16)).astype(np.float32)
    back = np.asarray(fourier.irfft3(fourier.rfft3(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_inverse_laplacian_single_mode():
    """For f = cos(2 pi k.x): laplacian^-1 f = -f / (4 pi^2 |k|^2)."""
    n, kvec = 16, (2, 1, 0)
    f = _single_mode(n, kvec)
    phi = np.asarray(fourier.irfft3(fourier.inverse_laplacian(fourier.rfft3(jnp.asarray(f)))))
    k2 = sum(k ** 2 for k in kvec)
    expected = -f / (4 * np.pi ** 2 * k2)
    np.testing.assert_allclose(phi, expected, atol=1e-6)


def test_inverse_laplacian_7pt_is_discrete_inverse():
    """The 7pt spectral kernel must exactly invert the 7-point stencil."""
    rng = np.random.default_rng(1)
    b = rng.random((16, 16, 16)).astype(np.float32)
    b -= b.mean()
    phi = fourier.irfft3(fourier.inverse_laplacian_7pt(fourier.rfft3(jnp.asarray(b))))
    lap = np.asarray(laplacian.operator(phi))
    np.testing.assert_allclose(lap, b, atol=2e-3)


def test_gradient_single_mode():
    n, kvec = 16, (0, 3, 0)
    f = _single_mode(n, kvec)
    g = np.asarray(fourier.irfft3_vec(fourier.gradient(fourier.rfft3(jnp.asarray(f)))))
    x = np.arange(n) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    expected = -2 * np.pi * 3 * np.sin(2 * np.pi * 3 * Y)
    np.testing.assert_allclose(g[..., 1], expected, atol=1e-4)
    np.testing.assert_allclose(g[..., 0], 0, atol=1e-4)


def test_gradient_inverse_laplacian_consistency():
    """grad(laplacian^-1 f) == gradient_inverse_laplacian(f)."""
    rng = np.random.default_rng(2)
    f = rng.random((16, 16, 16)).astype(np.float32)
    f -= f.mean()
    fk = fourier.rfft3(jnp.asarray(f))
    a = np.asarray(fourier.irfft3_vec(fourier.gradient(fourier.inverse_laplacian(fk))))
    b = np.asarray(fourier.irfft3_vec(fourier.gradient_inverse_laplacian(fk)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_hessian_trace_is_laplacian():
    rng = np.random.default_rng(3)
    f = rng.random((16, 16, 16)).astype(np.float32)
    fk = fourier.rfft3(jnp.asarray(f))
    trace = (
        np.asarray(fourier.irfft3(fourier.hessian(fk, (0, 0))))
        + np.asarray(fourier.irfft3(fourier.sum_of_hessian(fk, (1, 1), (2, 2))))
    )
    # -4 pi^2 k^2 f == continuous laplacian of f
    lap = np.asarray(
        fourier.irfft3(
            fourier.rfft3(jnp.asarray(f))
            * jnp.asarray(-4 * np.pi ** 2)
            * jnp.asarray(fourier._k2(16))
        )
    )
    np.testing.assert_allclose(trace, lap, atol=1e-2)


def test_diff_of_hessian():
    rng = np.random.default_rng(4)
    f = rng.random((8, 8, 8)).astype(np.float32)
    fk = fourier.rfft3(jnp.asarray(f))
    d = np.asarray(fourier.irfft3(fourier.diff_of_hessian(fk, (0, 0), (1, 1))))
    h00 = np.asarray(fourier.irfft3(fourier.hessian(fk, (0, 0))))
    h11 = np.asarray(fourier.irfft3(fourier.hessian(fk, (1, 1))))
    np.testing.assert_allclose(d, h00 - h11, atol=1e-4)


def test_power_spectrum_single_mode():
    n = 32
    amp = 2.0
    f = _single_mode(n, (3, 0, 0), amp) * n ** 3  # density-like normalisation
    k, pk, nmodes = fourier.power_spectrum(fourier.rfft3(jnp.asarray(f)), 0)
    k, pk, nmodes = np.asarray(k), np.asarray(pk), np.asarray(nmodes)
    # all power in the |k|=3 bin
    peak = np.argmax(pk)
    assert abs(k[peak] - 3.0) < 0.5
    assert pk[peak] > 100 * np.delete(pk, peak).max() + 1e-9


def test_power_spectrum_parseval_white_noise():
    """<|delta_k|^2> of unit white noise ~ N^3 in the reference convention."""
    n = 32
    rng = np.random.default_rng(5)
    f = rng.standard_normal((n, n, n)).astype(np.float32)
    k, pk, nmodes = fourier.power_spectrum(fourier.rfft3(jnp.asarray(f)), 0)
    pk = np.asarray(pk)
    np.testing.assert_allclose(pk.mean(), n ** 3, rtol=0.15)
