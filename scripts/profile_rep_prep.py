"""Which piece of the repulsion prep costs what (one chip, M=51200).

The fused repulsion kernel is 1.65 ms; the differentiable prep around it
(gathers, centroids, top-k neighbors, one-hot far weights + their VJP)
adds ~1.4 ms. This times each piece fwd (and the gather VJPs) separately.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/profile_rep_prep.py
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

STEPS = 100


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def scan_wrap(body):
    @jax.jit
    def run(*args):
        def step(carry, i):
            return body(carry, i, *args[1:]), ()

        carry, _ = jax.lax.scan(step, args[0], jnp.arange(STEPS))
        return carry

    return run


def main():
    from burn_raymarching_tpu.models.scene import activate
    from burn_raymarching_tpu.ops.culling import build_clusters

    from bench_large import make_params  # noqa: E402

    m = 51200
    padded, mask = make_params(m)
    centers, *_ = activate(padded)
    cl = build_clusters(np.asarray(padded.centers), mask=np.asarray(mask),
                        group=64)
    member_idx = cl.member_idx
    member_valid = cl.member_valid & jnp.take(mask.astype(bool), member_idx)
    c_count, g = member_idx.shape
    w = member_valid.astype(jnp.float32)
    counts = jnp.sum(w, axis=1)
    w_near = 8

    def gather_cs(carry, i):
        cs = jnp.take(centers + carry * 0.0, member_idx.reshape(-1),
                      axis=0).reshape(c_count, g, 3)
        return carry + cs[0, 0]

    print(f"member gather fwd      : "
          f"{timed(scan_wrap(gather_cs), jnp.zeros(3)):7.3f} ms")

    cs = jnp.take(centers, member_idx.reshape(-1), axis=0).reshape(
        c_count, g, 3)
    centroids = (jnp.sum(cs * w[..., None], axis=1)
                 / jnp.maximum(counts, 1.0)[:, None])

    def cent(carry, i):
        c2 = (jnp.sum((cs + carry * 0.0) * w[..., None], axis=1)
              / jnp.maximum(counts, 1.0)[:, None])
        return carry + c2[0]

    print(f"centroids fwd          : "
          f"{timed(scan_wrap(cent), jnp.zeros(3)):7.3f} ms")

    def topk(carry, i):
        cd2 = jnp.sum((centroids[:, None, :] - centroids[None, :, :] +
                       carry * 0.0) ** 2, axis=2)
        cd2 = jnp.where((counts > 0)[None, :], cd2, jnp.inf)
        _, nb = jax.lax.top_k(-cd2, w_near)
        return carry + nb[0, 0].astype(jnp.float32)

    print(f"cd2 + top_k fwd        : "
          f"{timed(scan_wrap(topk), jnp.zeros(())):7.3f} ms")

    cd2 = jnp.sum((centroids[:, None, :] - centroids[None, :, :]) ** 2,
                  axis=2)
    cd2 = jnp.where((counts > 0)[None, :], cd2, jnp.inf)
    _, nb = jax.lax.top_k(-cd2, w_near)

    def approx_topk(carry, i):
        cd2l = jnp.sum((centroids[:, None, :] - centroids[None, :, :] +
                        carry * 0.0) ** 2, axis=2)
        cd2l = jnp.where((counts > 0)[None, :], cd2l, jnp.inf)
        _, nb2 = jax.lax.approx_max_k(-cd2l, w_near)
        return carry + nb2[0, 0].astype(jnp.float32)

    print(f"cd2 + approx_max_k fwd : "
          f"{timed(scan_wrap(approx_topk), jnp.zeros(())):7.3f} ms")

    def onehot(carry, i):
        fw = ((1.0 - jnp.sum(jax.nn.one_hot(nb, c_count, dtype=jnp.float32),
                             axis=1)) * (counts[None, :] + carry * 0.0))
        return carry + fw[0, 0]

    print(f"one_hot far weights    : "
          f"{timed(scan_wrap(onehot), jnp.zeros(())):7.3f} ms")

    def scatter_fw(carry, i):
        rows = jnp.broadcast_to(jnp.arange(c_count)[:, None], nb.shape)
        near = jnp.zeros((c_count, c_count), jnp.float32).at[
            rows.reshape(-1), nb.reshape(-1)].set(1.0)
        fw = (1.0 - near) * (counts[None, :] + carry * 0.0)
        return carry + fw[0, 0]

    print(f"scatter far weights    : "
          f"{timed(scan_wrap(scatter_fw), jnp.zeros(())):7.3f} ms")

    def nb_gather_vjp(carry, i):
        def f(cs_in):
            nb_cs = jnp.take(cs_in, nb, axis=0)
            return jnp.sum(nb_cs * 1e-3)

        l, gr = jax.value_and_grad(f)(cs + carry * 0.0)
        return carry + gr[0, 0] + l * 0.0

    print(f"neighbor gather f+vjp  : "
          f"{timed(scan_wrap(nb_gather_vjp), jnp.zeros(3)):7.3f} ms")

    def member_gather_vjp(carry, i):
        def f(c_in):
            cs2 = jnp.take(c_in, member_idx.reshape(-1), axis=0)
            return jnp.sum(cs2 * 1e-3)

        l, gr = jax.value_and_grad(f)(centers + carry * 0.0)
        return carry + gr[0] + l * 0.0

    print(f"member gather f+vjp    : "
          f"{timed(scan_wrap(member_gather_vjp), jnp.zeros(3)):7.3f} ms")


if __name__ == "__main__":
    main()
