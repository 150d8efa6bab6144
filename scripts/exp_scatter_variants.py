"""t-cache scatter/gather variants at the large-scene shape (one chip).

The warm-start cache update `t_cache.at[idx].set(t)` costs ~0.65 ms of the
~7 ms M=51k step (docs/PARITY.md per-component profile). XLA scatter hints
may cut it: culled-mode batch indices are SORTED (loop.py sorts for tile
coherence), and duplicate indices (with-replacement sampling) write the
IDENTICAL marched t for the same ray, so `unique_indices=True` is
semantically safe — any duplicate winning produces the same cache.

NEGATIVE RESULT (one v5e). Isolated measurements (second table in main):
  1d gather (B=16384 of P=7.86M): 0.25 ms — plain take == sorted ==
  sorted+unique;  [P, 9] row gather: 1.22 ms — all hint variants equal.
The scatter variants (first table) swing ±0.3 ms BETWEEN whole-process
runs with no stable ordering (sorted was worst in one run, best in the
next); the hints do nothing reliable on this backend. Leave
`.at[idx].set` / `jnp.take` alone. Real finding: the [B, 9] row gather
itself is latency-bound (~75 ns/row, ~0.5 GB/s effective — 590 KB of
payload costing 1.2 ms at the 7.9M-pixel config-4 dataset size); only a
coarser sampling granularity could beat it, which would change the
reference's iid-ray semantics.

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

    # Isolated gather comparison (the real step's shapes): the 1-D t-cache
    # gather and the [P, 9] packed-row gather of gather_batch, with sorted
    # indices (culled mode sorts the batch) and each hint separately.
    # unique_indices is FALSE for with-replacement sampling; XLA's gather
    # only consumes indices_are_sorted, but measure both to be sure.
    table = jnp.ones((P, 9), jnp.float32)
    acc = jnp.zeros(())

    def scan_acc(body):
        @jax.jit
        def run(a, k0):
            def step(carry, i):
                k = jax.random.fold_in(k0, i)
                idx = jnp.sort(jax.random.randint(k, (B,), 0, P))
                return body(carry, idx), ()

            carry, _ = jax.lax.scan(step, a, jnp.arange(STEPS))
            return carry

        return run

    gathers = {
        "1d plain take": lambda a, i: a + jnp.sum(jnp.take(cache, i)),
        "1d sorted": lambda a, i: a + jnp.sum(
            cache.at[i].get(indices_are_sorted=True)),
        "1d sorted+uniq": lambda a, i: a + jnp.sum(
            cache.at[i].get(indices_are_sorted=True, unique_indices=True)),
        "rows plain take": lambda a, i: a + jnp.sum(
            jnp.take(table, i, axis=0)),
        "rows sorted": lambda a, i: a + jnp.sum(
            table.at[i].get(indices_are_sorted=True)),
        "rows sorted+uniq": lambda a, i: a + jnp.sum(
            table.at[i].get(indices_are_sorted=True, unique_indices=True)),
    }
    for name, body in gathers.items():
        print(f"{name:>20}: {timed(scan_acc(body), acc, key):7.3f} ms")


if __name__ == "__main__":
    main()
