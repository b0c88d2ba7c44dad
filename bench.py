"""Benchmark: PM steps/sec on the flagship Newton configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric (BASELINE.json) is PM steps/sec at 256^3. The
reference (Numba/LLVM CPU) cannot run in this image (numba/astropy are not
installed), so the recorded baseline is a vectorised float32 NumPy
implementation of the identical PM step (CIC deposit via np.add.at, pocketfft
Poisson solve, 5-point stencil, CIC gather) on this host's CPU --
methodology in BENCH_NOTES.md. vs_baseline = TPU steps/sec / CPU-NumPy
steps/sec.
"""

import json
import os
import sys
import time

import numpy as np

NCOARSE = 8  # 256^3 grid
NPART = 256 ** 3
WARMUP = 3
ITERS = 10


def _rand_state(npart, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.01 * rng.standard_normal((npart, 3))).astype(np.float32)
    return pos, vel


def bench_tpu() -> float:
    import pysco_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from pysco_tpu import integrate, solver as solver_mod

    param = {
        "theory": "newton", "ncoarse": NCOARSE, "npart": NPART,
        "mass_scheme": "cic", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.25733, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    pos, vel = _rand_state(NPART)
    pos, vel = jnp.asarray(pos), jnp.asarray(vel)
    phi, u = solver_mod.empty_fields(cfg)
    pos, vel, acc, phi, u, _, _ = solver_mod.pm(
        cfg, True, False, pos, vel, phi, u, dyn
    )
    float(jnp.sum(acc))

    def sync(state):
        # block_until_ready is asynchronous on the axon tunnel backend; a
        # value fetch is the only reliable barrier.
        return float(jnp.sum(state[0]))

    dt = np.float32(1e-3)
    state = (pos, vel, acc, phi, u)
    for _ in range(WARMUP):
        out = integrate.step_donated(
            cfg, "leapfrog", False, False, *state, dyn, dt
        )
        state = out[:5]
    sync(state)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = integrate.step_donated(
            cfg, "leapfrog", False, False, *state, dyn, dt
        )
        state = out[:5]
    sync(state)
    elapsed = time.perf_counter() - t0
    return ITERS / elapsed


def _cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt):
    """Vectorised NumPy float32 reference step (CIC + FFT + 5pt + gather)."""
    half = np.float32(0.5 * dt)
    vel = vel - acc * half
    pos = pos + vel * np.float32(dt)
    pos -= np.floor(pos)

    xs = pos * np.float32(n)
    ijk = np.minimum(xs.astype(np.int32), n - 1)
    d = xs - np.float32(0.5) - ijk.astype(np.float32)
    sign = np.sign(d).astype(np.int32)
    absd = np.abs(d)
    i2 = (ijk + sign) % n
    w1, w2 = np.float32(1) - absd, absd
    grid = np.zeros(n ** 3, dtype=np.float32)
    for bx in range(2):
        ci = (i2 if bx else ijk)[:, 0]
        wi = (w2 if bx else w1)[:, 0]
        for by in range(2):
            cj = (i2 if by else ijk)[:, 1]
            wj = (w2 if by else w1)[:, 1]
            for bz in range(2):
                ck = (i2 if bz else ijk)[:, 2]
                wk = (w2 if bz else w1)[:, 2]
                # bincount is the fastest portable CPU scatter-add
                grid += np.bincount(
                    (ci * n + cj) * n + ck,
                    weights=(wi * wj * wk).astype(np.float64),
                    minlength=n ** 3,
                ).astype(np.float32)
    grid = grid.reshape(n, n, n)
    grid *= np.float32(n ** 3 / pos.shape[0])

    rhs = np.float32(1.5 * aexp * om_m) * (grid - np.float32(1))
    rhs_k = np.fft.rfftn(rhs)
    kf = ((np.arange(n) + n // 2) % n - n // 2).astype(np.float32)
    kx, ky = kf[:, None, None], kf[None, :, None]
    kz = np.arange(n // 2 + 1, dtype=np.float32)[None, None, :]
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    k2[0, 0, 0] = 1
    h = np.float32(1.0 / n)
    w = np.sinc(kx * h) * np.sinc(ky * h) * np.sinc(kz * h)
    phi_k = rhs_k * (w ** -4 * np.float32(-0.25 / np.pi ** 2) / k2)
    phi_k[0, 0, 0] = 0
    phi = np.fft.irfftn(phi_k, s=(n, n, n), axes=(0, 1, 2)).astype(np.float32)

    force = np.empty((n, n, n, 3), dtype=np.float32)
    for ax in range(3):
        force[..., ax] = np.float32(n / 12.0) * (
            8 * (np.roll(phi, -1, ax) - np.roll(phi, 1, ax))
            + np.roll(phi, 2, ax) - np.roll(phi, -2, ax)
        )
    fflat = force.reshape(-1, 3)
    acc_new = np.zeros_like(pos)
    for bx in range(2):
        ci = (i2 if bx else ijk)[:, 0]
        wi = (w2 if bx else w1)[:, 0]
        for by in range(2):
            cj = (i2 if by else ijk)[:, 1]
            wj = (w2 if by else w1)[:, 1]
            for bz in range(2):
                ck = (i2 if bz else ijk)[:, 2]
                wk = (w2 if bz else w1)[:, 2]
                acc_new += (wi * wj * wk)[:, None] * fflat[(ci * n + cj) * n + ck]
    vel = vel - acc_new * half
    return pos, vel, acc_new


def bench_cpu_baseline() -> float:
    n = 2 ** NCOARSE
    pos, vel = _rand_state(NPART, seed=1)
    acc = np.zeros_like(pos)
    aexp, om_m, dt = 0.1, 0.25733, 1e-3
    # one warmup + timed iterations (it is slow; 2 iters suffice)
    _cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt)
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        pos, vel, acc = _cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt)
    return iters / (time.perf_counter() - t0)


def main():
    value = bench_tpu()
    cache = "bench_cpu_baseline.json"
    if os.path.exists(cache):
        with open(cache) as f:
            baseline = json.load(f)["steps_per_sec"]
    else:
        baseline = bench_cpu_baseline()
        with open(cache, "w") as f:
            json.dump({"steps_per_sec": baseline, "config": "newton CIC fft 256^3 numpy-f32"}, f)
    print(json.dumps({
        "metric": "PM steps/sec, Newton 256^3 grid + 256^3 particles (CIC+FFT)",
        "value": round(value, 3),
        "unit": "steps/sec",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
