"""Measure the 512^3 single-core CPU stand-in directly (VERDICT r3 item 6).

The 512^3 `vs_baseline` previously rested on an 8x-volume extrapolation of
the measured 256^3 stand-in (0.0068 steps/s -> 0.00085). This script runs
the identical vectorised NumPy float32 PM step (`bench._cpu_pm_step`) at
n = 512, npart = 512^3 and caches the measured rate in
`bench_cpu_baseline_512.json`, which bench.py then prefers over the
extrapolation. Expect ~15-25 min/step on this host's single core.

Usage: python tools/cpu_baseline_512.py  (run from the repo root)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    n = 512
    npart = 512 ** 3
    rng = np.random.default_rng(1)
    pos = rng.random((npart, 3), dtype=np.float32)
    vel = (0.01 * rng.standard_normal((npart, 3))).astype(np.float32)
    acc = np.zeros_like(pos)
    aexp, om_m, dt = 0.1, 0.25733, 1e-3
    # one warmup step (first-touch page faults, FFT plan), then 2 timed
    print("warmup step...", flush=True)
    t0 = time.perf_counter()
    pos, vel, acc = bench._cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt)
    print(f"warmup: {time.perf_counter() - t0:.1f} s", flush=True)
    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        pos, vel, acc = bench._cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt)
        print(f"step {i + 1}: cumulative {time.perf_counter() - t0:.1f} s",
              flush=True)
    sps = iters / (time.perf_counter() - t0)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_cpu_baseline_512.json")
    with open(out, "w") as f:
        json.dump({"steps_per_sec": sps,
                   "config": "newton CIC fft 512^3 numpy-f32",
                   "note": ("directly measured single-core stand-in at "
                            "512^3; replaces the 8x-volume extrapolation "
                            "from the 256^3 number")}, f)
    print(json.dumps({"steps_per_sec": sps}), flush=True)


if __name__ == "__main__":
    main()
