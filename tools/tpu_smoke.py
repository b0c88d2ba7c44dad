"""On-TPU smoke test: one jitted step per engine x theory on the real chip.

The pytest suite runs the Pallas kernels in interpret mode on the CPU
mesh, so a Mosaic miscompile would pass every test and only surface in
the benchmark. This script compiles and runs ONE step of each
{pallas, dense, scatter} x {newton, fr, mond} combination at 64^3 on the
attached chip and asserts the diagnostics are finite. With the persistent
compilation cache (shared with bench.py) a warm run takes well under two
minutes; run it whenever kernel code changed and a TPU is attached.

Usage: python tools/tpu_smoke.py [--small] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--cpu" in sys.argv:
        # validate the script logic without a TPU (8 virtual devices so
        # the distribution-mode rows exercise real collectives)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    # per-user persistent cache shared with bench.py and pysco_tpu.run()
    # (a repo-local dir is evicted by `git clean` between sessions).
    # BENCH_JAX_CACHE follows the `compile_cache` param semantics: a path
    # overrides the dir, '0'/'no'/'off' disables, 'yes'/'1'/empty keep
    # the default (utils/compile_cache.py).
    from pysco_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.environ.get("BENCH_JAX_CACHE"))

    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np

    from pysco_tpu import integrate, solver as solver_mod
    from pysco_tpu.ops import pallas_pm

    if jax.default_backend() == "cpu":
        print("WARNING: no TPU attached -- this exercises interpret mode "
              "only, which the pytest suite already covers")

    ncoarse = 5 if "--small" in sys.argv else 6
    npart = (2 ** ncoarse) ** 3
    failures = []
    for engine in ("pallas", "dense", "scatter"):
        for theory in ("newton", "fr", "mond"):
            t0 = time.perf_counter()
            param = {
                "theory": theory, "ncoarse": ncoarse, "npart": npart,
                "mass_scheme": "tsc",
                "linear_newton_solver": "multigrid",
                "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
                "fR_n": 1, "fR_logfR0": 5.0, "Om_lambda": 0.7,
                "Om_r": 0.0, "w0": -1.0, "wa": 0.0,
                "unit_l": 3085.0, "unit_t": 1e10,
                "mond_function": "simple", "mond_alpha": 1.0,
                "mond_g0": 1.2, "mond_scale_factor_exponent": 0.0,
                "aexp": 0.2, "Om_m": 0.3, "epsrel": 1e-2,
                "particle_engine": engine,
            }
            try:
                cfg = solver_mod.config_from_param(param)
                dyn = solver_mod.compute_dynamics(param)
                k = jr.PRNGKey(0)
                if engine == "pallas":
                    n_up = pallas_pm.padded_cols(npart)
                    pos = jr.uniform(k, (4, n_up), jnp.float32)
                    pos = pos.at[3].set(0.0)
                    vel = 0.01 * jr.normal(jr.fold_in(k, 1), (4, n_up),
                                           jnp.float32)
                    vel = vel.at[3].set(0.0)
                else:
                    pos = jr.uniform(k, (npart, 3), jnp.float32)
                    vel = 0.01 * jr.normal(jr.fold_in(k, 1), (npart, 3),
                                           jnp.float32)
                phi, u = solver_mod.empty_fields(cfg)
                out = solver_mod.pm(cfg, True, False, pos, vel, phi, u,
                                    dyn)
                state = out[:5]
                step = integrate.step(cfg, "leapfrog", False, False,
                                      *state, dyn, np.float32(1e-3))
                diag = step[6]
                vals = {
                    "max|acc|": float(diag.max_abs_acc),
                    "max|vel|": float(diag.max_abs_vel),
                    "mean(u)": float(diag.mean_additional),
                }
                ok = all(np.isfinite(v) for v in vals.values()) and (
                    vals["max|acc|"] > 0
                )
                status = "OK " if ok else "BAD"
                if not ok:
                    failures.append((engine, theory, vals))
                print(f"{status} {engine:8s} {theory:7s} "
                      f"{time.perf_counter() - t0:6.1f}s  {vals}",
                      flush=True)
            except Exception as e:  # noqa: BLE001 - report and continue
                failures.append((engine, theory, repr(e)))
                print(f"FAIL {engine:8s} {theory:7s} "
                      f"{time.perf_counter() - t0:6.1f}s  {e!r}",
                      flush=True)

    # distribution modes on however many devices are attached (one on the
    # axon tunnel): the sharded steps compile different Mosaic programs
    # (slab window shapes, halo exchanges, psum'd deposit) than the
    # single-chip path, so exercise them on the real backend too.
    from pysco_tpu.parallel import pm as par_pm, slab

    for mode, theory, solver_name in (
        ("slab", "newton", "fft"),
        ("slab", "fr", "multigrid"),
        ("replicated", "newton", "fft"),
    ):
        t0 = time.perf_counter()
        param = {
            "theory": theory, "ncoarse": ncoarse, "npart": npart,
            "mass_scheme": "tsc", "linear_newton_solver": solver_name,
            "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
            "fR_n": 1, "fR_logfR0": 5.0, "Om_lambda": 0.7,
            "Om_r": 0.0, "w0": -1.0, "wa": 0.0,
            "unit_l": 3085.0, "unit_t": 1e10,
            "mond_function": "simple", "mond_alpha": 1.0,
            "mond_g0": 1.2, "mond_scale_factor_exponent": 0.0,
            "aexp": 0.2, "Om_m": 0.3, "epsrel": 1e-2,
            "particle_engine": "pallas",
        }
        try:
            cfg = solver_mod.config_from_param(param)
            dyn = solver_mod.compute_dynamics(param)
            k = jr.PRNGKey(2)
            pos = jr.uniform(k, (npart, 3), jnp.float32)
            vel = 0.01 * jr.normal(jr.fold_in(k, 1), (npart, 3),
                                   jnp.float32)
            if mode == "slab":
                mesh = slab.make_mesh()
                state = slab.distribute_particles(
                    mesh, cfg, np.asarray(pos), np.asarray(vel)
                )
                out = slab.make_slab_step(cfg, mesh, "leapfrog",
                                          first_call=True)(
                    *state, dyn, np.float32(0)
                )
                out = slab.make_slab_step(cfg, mesh, "leapfrog")(
                    *out[:6], dyn, np.float32(1e-3)
                )
                diag = out[7]
            else:
                mesh = par_pm.make_mesh()
                pos_c, vel_c = pallas_pm.to_columns_host(
                    np.asarray(pos), np.asarray(vel), npart
                )
                phi, u = solver_mod.empty_fields(cfg)
                acc = jnp.zeros_like(jnp.asarray(pos_c))
                state = par_pm.shard_state(
                    mesh, jnp.asarray(pos_c), jnp.asarray(vel_c), acc,
                    phi, u,
                )
                out = par_pm.make_sharded_step(cfg, mesh, "leapfrog",
                                               first_call=True)(
                    *state, dyn, np.float32(0)
                )
                out = par_pm.make_sharded_step(cfg, mesh, "leapfrog")(
                    *out[:5], dyn, np.float32(1e-3)
                )
                diag = out[6]
            vals = {
                "max|acc|": float(diag.max_abs_acc),
                "max|vel|": float(diag.max_abs_vel),
                "overflow": float(diag.overflow),
            }
            ok = all(np.isfinite(v) for v in vals.values()) and (
                vals["max|acc|"] > 0 and vals["overflow"] == 0
            )
            status = "OK " if ok else "BAD"
            if not ok:
                failures.append((mode, theory, vals))
            print(f"{status} {mode:10s} {theory:7s} "
                  f"{time.perf_counter() - t0:6.1f}s  {vals}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append((mode, theory, repr(e)))
            print(f"FAIL {mode:10s} {theory:7s} "
                  f"{time.perf_counter() - t0:6.1f}s  {e!r}", flush=True)

    if failures:
        raise SystemExit(f"smoke failures: {failures}")
    print("all engine x theory x mode combinations finite on this backend")


if __name__ == "__main__":
    main()
