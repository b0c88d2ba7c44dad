#!/usr/bin/env python
"""On-chip multigrid component profile (the Newton-multigrid-vs-FFT gap).

Times, at a given grid size (default 256^3): one packed red-black
smoothing pass, residual_error, truncation_error, one V/F/W cycle, the
full tolerance-converged linear solve (with cycle count), and the FFT
solve path for comparison. Uses the value-fetch sync required on the
axon backend. Run only when the TPU tunnel is alive:

    python tools/mg_profile.py [ncoarse] [cycle]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _setup_compile_cache  # noqa: E402

_setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pysco_tpu.models import laplacian as lap, multigrid as mg  # noqa: E402
from pysco_tpu.ops import fourier  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ncoarse = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cycle = sys.argv[2] if len(sys.argv) > 2 else "V"
    n = 2 ** ncoarse
    npre, npost = 2, 1
    key = jax.random.PRNGKey(0)
    # overdensity-like rhs: mean-zero lognormal-ish field
    d = jax.random.normal(key, (n, n, n), jnp.float32)
    rhs = (d - jnp.mean(d)) * 5.0
    rhs = jax.device_put(rhs)
    x0 = jax.jit(lap.initialise_potential)(rhs)
    sync(x0), sync(rhs)

    smooth = jax.jit(lambda x, b: lap.smoothing(x, b, npre))
    res_err = jax.jit(lap.residual_error)
    trunc = jax.jit(lap.truncation_error)
    vcyc = jax.jit(lambda x, b: mg.V_cycle(x, b, ncoarse, npre, npost))

    print(f"grid {n}^3, Npre={npre} Npost={npost}, cycle={cycle}")
    print(f"smoothing x{npre}:      {timeit(smooth, x0, rhs):8.2f} ms")
    print(f"residual_error:    {timeit(res_err, x0, rhs):8.2f} ms")
    print(f"truncation_error:  {timeit(trunc, x0):8.2f} ms")
    print(f"one V_cycle:       {timeit(vcyc, x0, rhs):8.2f} ms")

    # converged solve + cycle count (host-replicated loop, same exit rule)
    tol = float(1e-2 * trunc(x0))
    x, prev, cycles = x0, 1e30, 0
    t0 = time.perf_counter()
    while cycles < mg.MAX_CYCLES:
        x = vcyc(x, rhs)
        err = float(res_err(x, rhs))
        cycles += 1
        if err <= tol or err * 2 > prev:
            break
        prev = err
    t_host = (time.perf_counter() - t0) * 1e3
    print(f"converged solve:   {t_host:8.2f} ms in {cycles} cycles "
          f"(host loop, tol {tol:.3e})")

    solve = jax.jit(
        lambda x, b, t: mg.linear(x, b, ncoarse, npre, npost, t, cycle)
    )
    print(f"mg.linear jitted:  {timeit(solve, x0, rhs, jnp.float32(tol)):8.2f} ms")

    fft_solve = jax.jit(
        lambda b: fourier.irfft3(fourier.inverse_laplacian(fourier.rfft3(b)))
    )
    print(f"fft solve:         {timeit(fft_solve, rhs):8.2f} ms")

    # warm-start regime: the run loop rescales the previous potential, so
    # per-step solves start near the answer -- measure one more cycle
    # from the converged x
    x_warm = solve(x0, rhs, jnp.float32(tol))
    sync(x_warm)
    print(f"warm re-solve:     {timeit(solve, x_warm, rhs, jnp.float32(tol)):8.2f} ms")


if __name__ == "__main__":
    main()
