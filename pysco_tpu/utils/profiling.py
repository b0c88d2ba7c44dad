"""Timing and profiling utilities.

Parity with the reference's tracing hooks (``utils.py:18-136``:
``time_me`` wall-time decorator, ``profile_me`` cProfile dump) adapted to
the XLA execution model: device work is asynchronous, so per-call wall
times only mean something when the caller synchronises -- ``time_me``
fetches a value when handed JAX arrays, and :func:`trace` exposes
``jax.profiler`` traces for kernel-level analysis.
"""

from __future__ import annotations

import cProfile
import functools
import logging
from contextlib import contextmanager
from time import perf_counter


def _sync(result):
    """Force completion of any JAX arrays in a result pytree.

    A device-side reduce + scalar fetch: the only reliable barrier on
    async backends, without shipping whole arrays to the host (a full
    np.asarray fetch costs seconds over the tunnel).
    """
    try:
        import jax
        import jax.numpy as jnp

        for leaf in jax.tree.leaves(result):
            if hasattr(leaf, "addressable_data"):
                x = leaf
                while getattr(x, "ndim", 0) > 1:
                    x = x[0]
                float(jnp.sum(x if x.ndim == 0 else x[:1]).real)
    except Exception:  # pragma: no cover - sync is best-effort
        pass
    return result


def time_me(func):
    """Log wall time per call at INFO (reference utils.py:18-57)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t0 = perf_counter()
        result = _sync(func(*args, **kwargs))
        logging.info("%s took %.6f s", func.__name__, perf_counter() - t0)
        return result

    return wrapper


def profile_me(func):
    """Dump a cProfile of the call to ``<func>.prof``
    (reference utils.py:60-136)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        profiler = cProfile.Profile()
        profiler.enable()
        result = _sync(func(*args, **kwargs))
        profiler.disable()
        fname = f"{func.__name__}.prof"
        profiler.dump_stats(fname)
        logging.warning("Profiling: wrote %s (inspect with snakeviz/pstats)", fname)
        return result

    return wrapper


def component_breakdown(cfg, position, velocity, dyn, iters: int = 3):
    """Per-component wall times (ms) of one force evaluation on the pallas
    engine: tile sort, deposit, field solve + gradient, gather.

    Runs each stage standalone with a value-fetch barrier, so the numbers
    are honest on asynchronous backends. Used by the run loop at
    verbose=2 (the reference's @time_me per-kernel timings,
    utils.py:18-57, have no equivalent inside a fused XLA step -- this is
    the observable substitute).
    """
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_pm
    from .. import solver as solver_mod

    m = cfg.ncells_1d
    scheme = cfg.mass_scheme
    interpret = jax.default_backend() == "cpu"

    def timeit(fn, *args):
        out = fn(*args)
        _sync(out)
        t0 = perf_counter()
        for _ in range(iters):
            # free the previous output BEFORE the next call: at 512^3 a
            # second live (4, N) sorted copy pushes the loop past HBM
            del out
            out = fn(*args)
        _sync(out)
        return (perf_counter() - t0) / iters * 1e3, out

    sort_fn = jax.jit(
        lambda p, v: pallas_pm.sort_particles(p, v, m, scheme)
    )
    t_sort, (pos_s, vel_s, starts) = timeit(sort_fn, position, velocity)
    # the unsorted state is only needed by the sort stage; at 512^3 the
    # 4.3 GB it holds is the margin the solve/gather stages need
    del position, velocity
    t_dep, dens = timeit(
        lambda p, s: pallas_pm.deposit(
            p, s, m, scheme, interpret,
            precision=solver_mod.sorted_precisions(cfg)[0]),
        pos_s, starts,
    )
    norm = jnp.float32(m ** 3 / cfg.npart)

    @jax.jit
    def solve(d):
        force, _, _, _ = solver_mod._solve_fields(
            cfg, True, False, d * norm, jnp.zeros_like(d),
            jnp.zeros_like(d), dyn
        )
        return force

    t_solve, force = timeit(solve, dens)
    t_gat, _ = timeit(
        lambda f, p, s: pallas_pm.gather_vec(
            f, p, s, scheme, interpret,
            precision=solver_mod.sorted_precisions(cfg)[1]),
        force, pos_s, starts,
    )
    return {
        "tile_sort_ms": round(t_sort, 1),
        "deposit_ms": round(t_dep, 1),
        "solve_plus_gradient_ms": round(t_solve, 1),
        "gather_ms": round(t_gat, 1),
    }


@contextmanager
def trace(log_dir: str = "/tmp/pysco_tpu_trace"):
    """Capture a jax.profiler device trace around a code block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.warning("jax.profiler trace written to %s", log_dir)
