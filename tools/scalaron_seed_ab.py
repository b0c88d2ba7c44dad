"""A/B of the f(R) scalaron FIRST-guess seed (ROADMAP item 4).

Arm A (production): zero-neighbour per-cell root,
``cubic.initialise_potential`` (reference cubic.py:217 semantics).
Arm B (candidate): background-seeded u0 = -q/b -- the exact uniform
fixed point of the FAS operator (u^3 + (h^2 b - u^2) u + q h^2 = 0 at
u_nb = u reduces to b u + q = 0) -- guarded back to arm A's root where
b <= 0 or the ratio is non-positive/non-finite.

Measures, per arm, on (1) an EXACTLY uniform density (the degenerate
branch-capture input documented in models/cubic.py) and (2) a clustered
density with O(1) contrast:

- FAS cycles to convergence (tool-local counting clone of
  multigrid._converge -- production semantics incl. the tolerance
  computed FROM the seed, ratio<2 exit and the MAX_CYCLES cap);
- final residual error and mean(u) (the physical branch sits at ~1);
- wall time of seed + solve (meaningful on the TPU; on CPU use the
  cycle counts).

Usage: python tools/scalaron_seed_ab.py [ncoarse] [cpu]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    ncoarse = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    if "cpu" in sys.argv[2:]:
        import __graft_entry__ as g

        g._force_virtual_cpu_mesh(1)
    bench._setup_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pysco_tpu import solver as solver_mod
    from pysco_tpu.models import cubic, multigrid

    m = 2 ** ncoarse
    param = bench._param_dict(ncoarse, m ** 3, "cic", "fr", "multigrid")
    dyn = solver_mod.compute_dynamics(param)
    F32 = jnp.float32

    def converge_count(u, b, ops, tolerance):
        """multigrid._converge with a cycle counter in the carry."""
        def cond(c):
            _, _, it, done = c
            return (~done) & (it < multigrid.MAX_CYCLES)

        def body(c):
            x, prev, it, _ = c
            x = multigrid.V_cycle_FAS(x, b, ops, ncoarse, 2, 1)
            err = ops.residual_error(x, b)
            done = (err <= tolerance) | (err * F32(2) > prev)
            return (x, err, it + 1, done)

        x, err, it, _ = lax.while_loop(
            cond, body, (u, F32(1e30), jnp.int32(0), jnp.bool_(False))
        )
        return x, err, it

    @jax.jit
    def solve(density, use_bg_seed):
        dens_term = dyn.fR_f1 * density + dyn.fR_f2
        u_a = cubic.initialise_potential(dens_term, dyn.fR_q)
        u_bg = -dyn.fR_q / dens_term
        u_b = jnp.where(
            jnp.isfinite(u_bg) & (u_bg > 0), u_bg.astype(F32), u_a
        )
        u = jnp.where(use_bg_seed, u_b, u_a)
        ops = multigrid.fas_ops_cubic(dyn.fR_q, False)
        tolerance = dyn.epsrel * ops.truncation_error(u, dens_term)
        x, err, it = converge_count(u, dens_term, ops, tolerance)
        return x, err, it, jnp.mean(u)

    @jax.jit
    def make_density(kind):
        uni = jnp.ones((m, m, m), jnp.float32)
        blob = jax.random.gamma(jax.random.PRNGKey(0), 0.5,
                                (m, m, m)).astype(jnp.float32)
        blob = blob / jnp.mean(blob)
        return jnp.where(kind == 0, uni, blob)

    out = {"ncoarse": ncoarse}
    for kind, kname in ((0, "uniform"), (1, "contrast")):
        density = make_density(kind)
        bench._sync(density)
        for seed_flag, sname in ((False, "zero_nb"), (True, "bg")):
            x, err, it, _ = solve(density, seed_flag)  # compile+warm
            bench._sync(x)
            t0 = time.perf_counter()
            x, err, it, mu = solve(density, seed_flag)
            bench._sync(x)
            dt = time.perf_counter() - t0
            out[f"{kname}_{sname}"] = {
                "cycles": int(it), "residual": float(err),
                "mean_u_converged": round(float(jnp.mean(x)), 6),
                "wall_s": round(dt, 3),
            }
            print(kname, sname, out[f"{kname}_{sname}"], flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
