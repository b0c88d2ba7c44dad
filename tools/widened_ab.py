"""On-chip A/B of the drift-widened kernel precision modes.

Measures deposit/gather wall time at drift 0/1/2 for the exact
(bf16x3) and single-pass (bf16) MXU modes at a given size (default
512^3 CIC, the BASELINE north-star config), using the same value-fetch
sync discipline as bench.py. This is the measurement behind the
`pm_precision_widened = "bf16-gather"` production default.

Usage: python tools/widened_ab.py [ncoarse] [scheme]
Env: PYSCO_TPU_ZB to sweep z-block sizes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (state builder + sync + compile cache)


def main():
    ncoarse = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    scheme = sys.argv[2] if len(sys.argv) > 2 else "cic"
    bench._setup_compile_cache()
    import jax
    import jax.numpy as jnp

    from pysco_tpu.ops import pallas_pm

    m = 2 ** ncoarse
    npart = m ** 3
    pos, vel = bench._device_state(npart)
    # donate: at 512^3 HBM cannot hold the unsorted AND sorted state
    # plus the sort's internal operand buffers
    sort = jax.jit(
        lambda p, v: pallas_pm.sort_particles(p, v, m, scheme),
        donate_argnums=(0, 1),
    )
    t0 = time.perf_counter()
    pos_s, vel_s, starts = sort(pos, vel)
    bench._sync(pos_s)
    t1 = time.perf_counter()
    pos_s, vel_s, starts = sort(pos_s, vel_s)
    bench._sync(pos_s)
    print(f"sort: compile+run {t1 - t0:.1f}s, warm "
          f"{time.perf_counter() - t1:.3f}s", flush=True)
    del vel_s

    rng_force = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (3, m, m, m), jnp.float32))
    force = rng_force()
    bench._sync(force)

    def timeit(fn, *args, iters=3):
        out = fn(*args)
        bench._sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            del out
            out = fn(*args)
        bench._sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        del out
        return dt

    results = {}
    for drift in (0, 1, 2):
        for prec in ("bf16x3", "bf16"):
            key = f"deposit_d{drift}_{prec}"
            results[key] = round(timeit(
                lambda p, s, d=drift, pr=prec: pallas_pm.deposit(
                    p, s, m, scheme, False, d, precision=pr),
                pos_s, starts), 1)
            print(key, results[key], flush=True)
            key = f"gather_d{drift}_{prec}"
            results[key] = round(timeit(
                lambda f, p, s, d=drift, pr=prec: pallas_pm.gather_vec_cl(
                    f, p, s, scheme, False, d, precision=pr),
                force, pos_s, starts), 1)
            print(key, results[key], flush=True)
    print(json.dumps({"config": f"{m}^3 {scheme} ZB="
                      + os.environ.get("PYSCO_TPU_ZB", "auto"),
                      "ms": results}), flush=True)


if __name__ == "__main__":
    main()
