"""On-chip A/B of tile-sort strategies for the particle engine.

The per-force-evaluation tile sort is the dominant component cost at
256^3 (~140 ms vs 38 deposit + 71 gather + 16 solve). Candidates:

  full    one global 7-operand lax.sort (key + 3 pos + 3 vel)  [default]
  nearly  two-round shifted block sort + monotonicity check + fallback
  index   2-operand lax.sort (key, iota) + one take() permutation of the
          six payload rows -- ~3.5x fewer bytes through the sort's
          O(log^2) compare-exchange passes, one extra gather pass
  nearly_index  the two combined

Prints one JSON line per variant: {"variant": ..., "ms": ...} plus raw
building blocks (sort2 alone, take alone) so the winner's cost model is
explainable. Run on the attached TPU:  python tools/sort_ab.py [ncoarse]
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    ".."))

import jax
import jax.numpy as jnp
from jax import lax

from pysco_tpu.ops import pallas_pm as pp


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1].astype(jnp.float32)))


def time_it(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ncoarse = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    m = 2 ** ncoarse
    npart = m ** 3
    n_up = pp.padded_cols(npart)

    @jax.jit
    def build():
        k = jax.random.PRNGKey(0)
        pos = jax.random.uniform(k, (4, n_up), jnp.float32)
        pos = pos.at[3].set(0.0)
        vel = 0.01 * jax.random.normal(jax.random.fold_in(k, 1),
                                       (4, n_up), jnp.float32)
        return pos, vel

    pos, vel = build()
    # start from a sorted state + small drift: the production regime for
    # the "nearly" variants (a random state falls back to the full sort)
    sorter = jax.jit(lambda p, v: pp.sort_particles(p, v, m, "cic"))
    pos, vel, starts = sorter(pos, vel)

    @jax.jit
    def drift(p, v):
        q = (p.at[:3].add(0.25 / m * jnp.sign(v[:3]))) % 1.0
        return jnp.where(p >= pp.SENTINEL_MIN, p, q)

    pos = drift(pos, vel)

    results = {}
    for mode in ("full", "nearly", "index", "nearly_index"):
        fn = jax.jit(lambda p, v, mode=mode: pp.sort_particles(
            p, v, m, "cic", mode=mode))
        try:
            results[mode] = round(time_it(fn, pos, vel), 2)
        except Exception as e:  # noqa: BLE001
            results[mode] = f"failed: {type(e).__name__}: {e}"
        print(json.dumps({"variant": mode, "ms": results[mode],
                          "ncoarse": ncoarse}), flush=True)

    # building blocks
    key = jax.jit(lambda p: pp.tile_keys(p, m, "cic"))(pos)

    @jax.jit
    def sort2(k):
        return lax.sort((k, jnp.arange(k.shape[0], dtype=jnp.int32)),
                        num_keys=1)

    _, idx = sort2(key)

    @jax.jit
    def take6(p, v, i):
        return jnp.take(p, i, axis=1), jnp.take(v, i, axis=1)

    @jax.jit
    def sort7(k, p, v):
        return lax.sort((k, p[0], p[1], p[2], v[0], v[1], v[2]),
                        num_keys=1)

    for name, fn, args in (
        ("raw_sort2", sort2, (key,)),
        ("raw_take6", take6, (pos, vel, idx)),
        ("raw_sort7", sort7, (key, pos, vel)),
    ):
        try:
            ms = round(time_it(fn, *args), 2)
        except Exception as e:  # noqa: BLE001
            ms = f"failed: {type(e).__name__}"
        print(json.dumps({"variant": name, "ms": ms, "ncoarse": ncoarse}),
              flush=True)


if __name__ == "__main__":
    main()
