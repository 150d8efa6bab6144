"""t-cache scatter/gather variants at the large-scene shape (one chip).

The warm-start cache update `t_cache.at[idx].set(t)` costs ~0.65 ms of the
~7 ms M=51k step (docs/PARITY.md per-component profile). XLA scatter hints
may cut it: culled-mode batch indices are SORTED (loop.py sorts for tile
coherence), and duplicate indices (with-replacement sampling) write the
IDENTICAL marched t for the same ray, so `unique_indices=True` is
semantically safe — any duplicate winning produces the same cache.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_scatter_variants.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_bench")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 200
P = 30 * 512 * 512  # 7.86M dataset pixels (config-4 512px shape)
B = 16384


def timed(run, *args):
    out = run(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def scan_over(body):
    @jax.jit
    def run(cache, key):
        def step(carry, i):
            k = jax.random.fold_in(key, i)
            idx = jnp.sort(jax.random.randint(k, (B,), 0, P))
            vals = jnp.cos(idx.astype(jnp.float32))
            return body(carry, idx, vals), ()

        carry, _ = jax.lax.scan(step, cache, jnp.arange(STEPS))
        return carry

    return run


def main():
    cache = jnp.zeros((P,), jnp.float32)
    key = jax.random.PRNGKey(0)

    variants = {
        "baseline .at[].set": lambda c, i, v: c.at[i].set(v),
        "sorted": lambda c, i, v: c.at[i].set(
            v, indices_are_sorted=True),
        "unique": lambda c, i, v: c.at[i].set(
            v, unique_indices=True),
        "sorted+unique": lambda c, i, v: c.at[i].set(
            v, indices_are_sorted=True, unique_indices=True),
        "no-scatter control": lambda c, i, v: c + jnp.sum(v) * 0.0,
        "gather only": lambda c, i, v: c.at[0].set(
            jnp.sum(jnp.take(c, i))),
        "gather sorted": lambda c, i, v: c.at[0].set(
            jnp.sum(c.at[i].get(indices_are_sorted=True,
                                unique_indices=True))),
    }
    for name, body in variants.items():
        print(f"{name:>20}: {timed(scan_over(body), cache, key):7.3f} ms")


if __name__ == "__main__":
    main()
