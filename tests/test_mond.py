"""QUMOND source-term tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pysco_tpu.models import laplacian, mond


def test_nu_functions_newtonian_limit():
    y = jnp.asarray(np.array([1e4, 1e6], dtype=np.float32))
    np.testing.assert_allclose(np.asarray(mond.nu_simple(y)), 1.0, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(mond.nu_n(y, 1)), 1.0, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(mond.nu_beta(y, 1.0)), 1.0, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(mond.nu_gamma(y, 1.0)), 1.0, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(mond.nu_delta(y, 1.0)), 1.0, rtol=1e-2)


def test_nu_simple_deep_mond_limit():
    # nu(y) ~ y^-1/2 for y -> 0
    y = jnp.asarray(np.array([1e-6], dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(mond.nu_simple(y)), 1e3, rtol=1e-2
    )


@pytest.mark.parametrize("fn,alpha", [
    ("simple", 1.0), ("n", 1.0), ("beta", 1.0), ("gamma", 1.0), ("delta", 1.0),
])
def test_rhs_newtonian_limit_is_laplacian(fn, alpha):
    """With g0 -> 0 (y -> inf), nu -> 1 and the QUMOND source reduces to
    the discrete face-centred divergence of grad(phi) = 7pt Laplacian."""
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.random((16, 16, 16)).astype(np.float32))
    out = np.asarray(mond.rhs(phi, 1e-8, fn, alpha))
    lap = np.asarray(laplacian.operator(phi))
    scale = np.abs(lap).max()
    np.testing.assert_allclose(out, lap, atol=2e-2 * scale)
