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
    """Force completion of any JAX arrays in a result pytree."""
    try:
        import jax

        for leaf in jax.tree.leaves(result):
            if hasattr(leaf, "addressable_data"):
                # value fetch: the only reliable barrier on async backends
                import numpy as np

                np.asarray(leaf).ravel()[:1]
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
