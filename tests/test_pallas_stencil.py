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


# ---------------------------------------------------------------------------
# Full-lattice kernels (residual norms, fused restriction, prolongation)
# ---------------------------------------------------------------------------

from pysco_tpu.ops import mesh, pallas_stencil as ps  # noqa: E402

Q = -0.27


def _fields(n=16, seed=3):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (n, n, n), F32)
    b = jax.random.normal(k2, (n, n, n), F32) * F32(5)
    rhs = jax.random.normal(k3, (n, n, n), F32) * F32(0.3)
    return x, b, rhs


def _rel(a, c):
    a, c = np.asarray(a), np.asarray(c)
    return float(np.max(np.abs(a - c)) / max(np.max(np.abs(c)), 1e-30))


def test_residual_norm2_matches_xla():
    from pysco_tpu.models import cubic, quartic

    x, b, _ = _fields()
    cases = [
        ("linear", {}, lap.residual_error(x, b)),
        ("reformulated", {}, lap.residual_error_reformulated(x, b)),
        ("cubic", {"q": Q}, cubic.residual_error(x, b, Q)),
        ("quartic", {"q": Q}, quartic.residual_error(x, b, Q)),
    ]
    for kind, kw, ref in cases:
        got = float(jnp.sqrt(ps.residual_norm2(kind, x, b, **kw)))
        assert abs(got - float(ref)) / float(ref) < 5e-6, (kind, got, ref)


def test_restrict3_matches_xla():
    from pysco_tpu.models import cubic, quartic

    x, b, rhs = _fields()
    r3 = ps.restrict3("linear", x, b)
    assert _rel(r3[0], mesh.restriction(b - lap.operator(x))) < 2e-6
    assert _rel(r3[1], mesh.restriction(x)) < 2e-6
    assert _rel(r3[2], mesh.restriction(b)) < 2e-6
    r2 = ps.restrict3("laplacian", x)
    assert _rel(r2[0], mesh.restriction(lap.operator(x))) < 2e-6
    r3 = ps.restrict3("reformulated", x, b, rhs=rhs)
    ref = mesh.restriction(rhs - lap.operator_reformulated(x, b))
    assert _rel(r3[0], ref) < 2e-6
    for kind, mod in (("cubic", cubic), ("quartic", quartic)):
        r3 = ps.restrict3(kind, x, b, q=Q)
        assert _rel(r3[0], mesh.restriction(mod.operator(x, b, Q))) < 2e-6
        r3 = ps.restrict3(kind, x, b, rhs=rhs, q=Q)
        ref = mesh.restriction(rhs - mod.operator(x, b, Q))
        assert _rel(r3[0], ref) < 2e-6


def test_add_prolongation_matches_xla():
    x, _, _ = _fields()
    xc = jax.random.normal(jax.random.PRNGKey(9), (8, 8, 8), F32)
    got = ps.add_prolongation(x, xc)
    assert _rel(got, x + mesh.prolongation(xc)) < 2e-6


def test_vcycle_with_forced_full_gate(monkeypatch):
    """A full linear V-cycle and a (linear-operator) FAS V-cycle routed
    through every fused Pallas kernel (gate forced on) match the XLA
    path. The FAS leg uses the laplacian ops: the scalaron FAS equation
    has near-critical cells where the Newton root amplifies ulp-level
    input differences unboundedly (see _scalaron_inputs above), so its
    end-to-end cycle is not ulp-comparable -- its fused kernels are
    covered component-wise in test_restrict3_matches_xla."""
    from pysco_tpu.models import multigrid as mg

    x, b, _ = _fields(n=16)
    ref_lin = mg.V_cycle(x, b, 4, 2, 1)
    ops = mg.fas_ops_laplacian()
    ref_fas = mg.V_cycle_FAS(x, b, ops, 4, 2, 1)

    monkeypatch.setattr(ps, "use_pallas_full", lambda n: True)
    monkeypatch.setattr(lap, "_use_pallas_sweeps",
                        lambda n, injected: not injected)
    got_lin = mg.V_cycle(x, b, 4, 2, 1)
    got_fas = mg.V_cycle_FAS(x, b, ops, 4, 2, 1)
    np.testing.assert_allclose(np.asarray(got_lin), np.asarray(ref_lin),
                               rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got_fas), np.asarray(ref_fas),
                               rtol=5e-5, atol=5e-6)


def test_restrict3_xla_fallback_matches(monkeypatch):
    """When the working set only fits at coarse-block depth 1 (512^3),
    restrict3 must compose the identical result in XLA (the cb=1 Mosaic
    lowering crashes the TPU compile helper)."""
    x, b, rhs = _fields()
    want = ps.restrict3("cubic", x, b, rhs=rhs, q=Q)
    monkeypatch.setattr(ps, "_VMEM_BUDGET", 1)
    got = ps.restrict3("cubic", x, b, rhs=rhs, q=Q)
    for w, g in zip(want, got):
        assert _rel(g, w) < 2e-6
