"""Ulp-level equality of the plane-pipelined Pallas sweeps
(ops/pallas_stencil.py, interpret mode on CPU) against the XLA packed
red-black smoothers they replace on the TPU backend. Operation order is
identical; the only difference is which sub-expressions each engine
contracts into FMAs, so agreement is to float32 roundoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysco_tpu.models import cubic, laplacian as lap, quartic

F32 = jnp.float32


def _grid(n, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (n, n, n), F32)
    b = jax.random.normal(k2, (n, n, n), F32) * F32(5)
    return x, b


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setattr(lap, "_use_pallas_sweeps", lambda n, injected: not injected)


@pytest.mark.parametrize("n_smoothing", [1, 3])
def test_linear_sweep_ulp(n_smoothing):
    x, b = _grid(16)
    ref = lap._smoothing_packed(x, b, n_smoothing)
    out = lap._smoothing_packed_pallas(x, b, n_smoothing)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-6, atol=2e-6)


def test_linear_sweep_with_rhs_ulp():
    x, b = _grid(16)
    rhs = jax.random.normal(jax.random.PRNGKey(7), x.shape, F32)
    ref = lap._smoothing_packed(x, b, 2, rhs)
    out = lap._smoothing_packed_pallas(x, b, 2, rhs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-6, atol=2e-6)


def test_gate_respects_injected_pack():
    # injected packing (the slab smoother) must never take the Pallas path
    assert not lap._use_pallas_sweeps(4096, injected=True)


def _scalaron_inputs(seed):
    """Well-conditioned scalaron state: the Newton polish is seeded from
    the previous sweep's root in production, where |f'(u)| = |3u^2 + p|
    is bounded away from zero. Keep |p| << 3 u0^2 here so a 1-ulp
    difference in the neighbour sum (FMA contraction) cannot flip the
    Newton trajectory -- near-critical cells amplify ulp noise
    arbitrarily, which is a property of the equation, not the kernel."""
    x, b = _grid(16, seed=seed)
    u0 = jnp.abs(x) * F32(0.003) + F32(0.2)
    return u0, b * F32(0.1)


@pytest.mark.parametrize("mod,q", [(cubic, -0.1), (quartic, -0.05)])
def test_scalaron_sweep_ulp(force_pallas, mod, q):
    u0, b = _scalaron_inputs(3)
    ref_fn = lambda: mod.smoothing(u0, b, q, 2)  # noqa: E731
    out = ref_fn()  # pallas (gate forced)
    with _xla_only():
        ref = ref_fn()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mod,q", [(cubic, -0.1)])
def test_scalaron_sweep_with_rhs_ulp(force_pallas, mod, q):
    u0, b = _scalaron_inputs(5)
    rhs = jax.random.normal(jax.random.PRNGKey(11), u0.shape, F32) * F32(0.001)
    out = mod.smoothing(u0, b, q, 2, rhs)
    with _xla_only():
        ref = mod.smoothing(u0, b, q, 2, rhs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


class _xla_only:
    """Temporarily disable the (test-forced) Pallas gate."""

    def __enter__(self):
        self._saved = lap._use_pallas_sweeps
        lap._use_pallas_sweeps = lambda n, injected: False

    def __exit__(self, *exc):
        lap._use_pallas_sweeps = self._saved
