"""Bit-exact oracle for the white-noise RNG stream (VERDICT r4 item 3).

``pysco_tpu.ic`` reproduces the reference's Gaussian-random-field draw
order as *vectorised* NumPy: one (middle+1, n, n) upper-half-space draw
block per field, Hermitian conjugate writes, last-write-wins resolution
on the self-conjugate i=0 / i=middle planes, then the 7 corner draws
(spec: reference ``initial_conditions.py:585-658``; force variant
``:732-905``; fixed variants ``:664-722`` and ``:867-973``).

This module re-implements that specification INDEPENDENTLY as literal
scalar triple loops over a full (n, n, n[, 3]) complex grid -- exactly
the reference's iteration structure, executed sequentially -- and
asserts the rfft half-grid slice is **bit-identical** to the vectorised
production stream for every path (random/fixed/paired x density/force).

What this pins down:

* the RNG draw order (block draws, then scalar corner draws -- the
  oracle uses seven *scalar* ``rng.random(dtype=f32)`` calls exactly
  like the reference, so it also proves our single ``rng.random(7)``
  vector draw consumes the identical stream);
* the Hermitian write order incl. the last-write-wins overwrite
  semantics on the overlapping planes (here they emerge naturally from
  sequential in-order writes; the production code encodes them as a
  ``t_low >= t_up`` mask in ``ic._hermitian_self_plane``);
* every corner/edge fix location, value and draw position.

Floating-point note: per-element arithmetic uses the same expression
grouping as the production code (e.g. the force kernel is built as
``((-1j * (invtwopi / k2)) * k_a) * U``), so the bit-level comparison
isolates ORDER errors rather than ulp-level multiplication-regrouping
noise. The production grouping differs from the reference's numba
fastmath scalar grouping by at most an ulp per element -- the physics
oracles (tests/test_physics_oracle.py) bound that axis.
"""

import numpy as np
import pytest

from pysco_tpu import ic

F32 = np.float32
C64 = np.complex64


def _rayleigh_scalar(rng):
    return F32(np.sqrt(-np.log(F32(1) - rng.random(dtype=F32))))


def oracle_density(n, rng, fixed=False, paired=False):
    """Scalar-loop density white noise per reference initial_conditions.py
    :585-658 (random) / :664-722 (fixed); returns the rfft half grid."""
    middle = n // 2
    twopi = F32(2 * np.pi)
    shift = F32(np.pi) if (fixed and paired) else F32(0)
    if not fixed:
        amps = rng.random((middle + 1, n, n), dtype=F32)
    phases = rng.random((middle + 1, n, n), dtype=F32)
    full = np.empty((n, n, n), dtype=C64)
    for i in range(middle + 1):
        for j in range(n):
            for k in range(n):
                phase = F32(twopi * phases[i, j, k] + shift)
                if fixed:
                    amp = F32(1)
                else:
                    amp = F32(np.sqrt(-np.log(F32(1) - amps[i, j, k])))
                re = F32(amp * np.cos(phase))
                im = F32(amp * np.sin(phase))
                full[i, j, k] = complex(re, im)
                full[-i % n, -j % n, -k % n] = complex(re, -im)
    full[0, 0, 0] = 0
    for idx in ((0, 0, middle), (0, middle, 0), (0, middle, middle),
                (middle, 0, 0), (middle, 0, middle), (middle, middle, 0),
                (middle, middle, middle)):
        full[idx] = F32(1) if fixed else _rayleigh_scalar(rng)
    return full[:, :, : middle + 1]


def oracle_force(n, rng, fixed=False, paired=False):
    """Scalar-loop force-space white noise per reference
    initial_conditions.py:732-857 (random) / :867-973 (fixed); returns
    the (n, n, middle+1, 3) rfft half grid.

    Deliberate deviation from the reference, encoded here on purpose:
    the z wavenumber is WRAPPED in the fftfreq convention (kz = k - n
    for k >= middle), where the reference uses the raw index
    (``kz = np.float32(k)``, initial_conditions.py:782) -- which gives
    the negative-frequency z-columns (half of all modes) a displacement
    kernel with the wrong magnitude AND sign (e.g. k=15 at n=16:
    |g| ~ 1/15 instead of 1, sign flipped). kx/ky are wrapped in both.
    See ic._force_kernels_upper.
    """
    middle = n // 2
    twopi = F32(2 * np.pi)
    invtwopi = F32(0.5 / np.pi)
    shift = F32(np.pi) if (fixed and paired) else F32(0)
    if not fixed:
        amps = rng.random((middle + 1, n, n), dtype=F32)
    phases = rng.random((middle + 1, n, n), dtype=F32)
    full = np.empty((n, n, n, 3), dtype=C64)
    for i in range(middle + 1):
        kx = F32(i - n) if i >= middle else F32(i)
        for j in range(n):
            ky = F32(j - n) if j >= middle else F32(j)
            for k in range(n):
                kz = F32(k - n) if k >= middle else F32(k)
                k2 = F32(kx * kx + ky * ky + kz * kz)
                phase = F32(twopi * phases[i, j, k] + shift)
                if fixed:
                    amp = F32(1)
                else:
                    amp = F32(np.sqrt(-np.log(F32(1) - amps[i, j, k])))
                re = F32(amp * np.cos(phase))
                im = F32(amp * np.sin(phase))
                up = complex(re, im)
                # production grouping: g_a = (-1j * (invtwopi / k2)) * k_a
                # (k2=0 only at the origin, overwritten by the edge fixes;
                # the production code masks it to 1 -- do the same here)
                c = F32(invtwopi / (k2 if k2 != 0 else F32(1)))
                for a, ka in enumerate((kx, ky, kz)):
                    g = np.complex64(-1j) * c * ka  # (0, -c*ka)
                    v = np.complex64(g * up)
                    full[i, j, k, a] = v
                    full[-i % n, -j % n, -k % n, a] = np.conj(v)
    # edge fixes, exact draw order (4 shared draws THEN 3 single draws)
    invkmiddle = F32(-1.0 / (twopi * middle))
    if fixed:
        d = iter([F32(1)] * 7)
    else:
        d = iter([_rayleigh_scalar(rng) for _ in range(7)])
    f110 = invkmiddle * F32(0.5) * next(d)
    f011 = invkmiddle * F32(0.5) * next(d)
    f101 = invkmiddle * F32(0.5) * next(d)
    f111 = invkmiddle * F32(1.0 / 3.0) * next(d)
    m = middle
    full[0, 0, 0, :] = 0
    full[0, m, 0, 0] = 0
    full[0, 0, m, 0] = 0
    full[0, m, m, 0] = 0
    full[m, 0, 0, 1] = 0
    full[0, 0, m, 1] = 0
    full[m, 0, m, 1] = 0
    full[m, 0, 0, 2] = 0
    full[0, m, 0, 2] = 0
    full[m, m, 0, 2] = 0
    full[m, 0, 0, 0] = invkmiddle * next(d)
    full[0, m, 0, 1] = invkmiddle * next(d)
    full[0, 0, m, 2] = invkmiddle * next(d)
    full[m, m, 0, 0] = f110
    full[m, 0, m, 0] = f101
    full[m, m, 0, 1] = f110
    full[0, m, m, 1] = f011
    full[0, m, m, 2] = f011
    full[m, m, m, :] = f111
    return full[:, :, : middle + 1]


def _assert_bit_identical(a, b, label):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape and a.dtype == b.dtype
    same = a.view(np.float32) == b.view(np.float32)
    if not same.all():
        bad = np.argwhere(~same)
        raise AssertionError(
            f"{label}: {len(bad)} component mismatches of {same.size}; "
            f"first at {bad[0]}: {a.view(np.float32)[tuple(bad[0])]} vs "
            f"{b.view(np.float32)[tuple(bad[0])]}"
        )


@pytest.mark.parametrize("n", [16, 32])
@pytest.mark.parametrize("seed", [42, 1234])
def test_density_random(n, seed):
    got = ic.white_noise_fourier(n, np.random.default_rng(seed))
    want = oracle_density(n, np.random.default_rng(seed))
    _assert_bit_identical(got, want, f"density n={n} seed={seed}")


@pytest.mark.parametrize("n", [16, 32])
@pytest.mark.parametrize("paired", [False, True])
def test_density_fixed(n, paired):
    got = ic.white_noise_fourier_fixed(n, np.random.default_rng(7), paired)
    want = oracle_density(n, np.random.default_rng(7), fixed=True,
                          paired=paired)
    _assert_bit_identical(got, want, f"fixed density n={n} paired={paired}")


@pytest.mark.parametrize("n", [16, 32])
@pytest.mark.parametrize("seed", [42, 1234])
def test_force_random(n, seed):
    got = ic.white_noise_fourier_force(n, np.random.default_rng(seed))
    want = oracle_force(n, np.random.default_rng(seed))
    _assert_bit_identical(got, want, f"force n={n} seed={seed}")


@pytest.mark.parametrize("n", [16, 32])
@pytest.mark.parametrize("paired", [False, True])
def test_force_fixed(n, paired):
    got = ic.white_noise_fourier_fixed_force(
        n, np.random.default_rng(7), paired
    )
    want = oracle_force(n, np.random.default_rng(7), fixed=True,
                        paired=paired)
    _assert_bit_identical(got, want, f"fixed force n={n} paired={paired}")


def test_draw_stream_continues_identically():
    """After the field draws, both implementations must leave the
    generator at the SAME stream position (run() draws density then
    force-free LPT uses more randomness only through these functions,
    but restart paths rely on the post-call state)."""
    r1 = np.random.default_rng(3)
    r2 = np.random.default_rng(3)
    ic.white_noise_fourier(16, r1)
    oracle_density(16, r2)
    assert r1.random() == r2.random()
    r1 = np.random.default_rng(5)
    r2 = np.random.default_rng(5)
    ic.white_noise_fourier_force(16, r1)
    oracle_force(16, r2)
    assert r1.random() == r2.random()
