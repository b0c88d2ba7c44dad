"""Persistent XLA compilation cache for library entry points.

Compile time dominates every cold process on the TPU backend (~230 s for
a 256^3 step program, ~90 s for the 512^3 LPT IC stages) while the
compiled programs themselves run in milliseconds-to-seconds.  The
reference pays an analogous cost once per machine via Numba's on-disk
cache (``@njit(cache=True)``, e.g. reference mesh.py:13); the TPU
equivalent is JAX's persistent compilation cache.  bench.py and
tools/tpu_smoke.py already enable it -- this module makes plain
``pysco_tpu.run()`` benefit too, so a production run (or a restart of
one) does not recompile programs it has already built.

Opt out with ``compile_cache = no`` in param.ini or
``PYSCO_TPU_JAX_CACHE=0``; point at a specific directory with
``compile_cache = /path`` or ``PYSCO_TPU_JAX_CACHE=/path``.
"""

from __future__ import annotations

import logging
import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pysco_tpu", "xla_cache"
)

_FALSE = {"0", "no", "false", "off", "none", ""}


def enable_compile_cache(setting: str | None = None) -> str | None:
    """Enable the persistent XLA compile cache. Idempotent.

    ``setting`` comes from the ``compile_cache`` param key: a falsy
    string disables, a path selects the directory, anything else (or
    None) uses ``PYSCO_TPU_JAX_CACHE`` / the per-user default.  Returns
    the directory in effect, or None when disabled/unsupported.
    """
    env = os.environ.get("PYSCO_TPU_JAX_CACHE")
    choice = setting if setting not in (None, "", "yes", "true", "on") else env
    if choice is not None and str(choice).casefold() in _FALSE:
        return None
    cache_dir = _DEFAULT_DIR
    if choice and str(choice).casefold() not in {"yes", "true", "on", "1"}:
        cache_dir = str(choice)

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took >2 s to build; tiny programs are
        # cheaper to rebuild than to hash and stat
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as exc:  # older jax or read-only filesystem
        logging.warning("compile cache unavailable (%s); compiling fresh", exc)
        return None
    return cache_dir
