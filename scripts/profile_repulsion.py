"""Breakdown of the fused cluster-repulsion path at large M (one chip).

Separates: full fused fwd+bwd (per block_c), fwd only, the raw pallas
_rep_call on precomputed plane inputs (kernel only, no prep/no prep-VJP),
and the XLA baseline. Informs block_c defaults and whether the prep
(gathers/top-k/one-hot + their VJP) is the next wall.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/profile_repulsion.py --m 51200
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=51200)
    ap.add_argument("--group", type=int, default=64)
    args = ap.parse_args()

    import functools

    from burn_raymarching_tpu.models.scene import activate
    from burn_raymarching_tpu.ops.culling import build_clusters
    from burn_raymarching_tpu.ops.pallas import repulsion_kernel as rk
    from burn_raymarching_tpu.train.loss import cluster_repulsion

    from bench_large import make_params  # noqa: E402

    rk._VMEM_TILE_BUDGET = 1 << 30  # sweep block_c freely; Mosaic errors if OOM

    padded, mask = make_params(args.m)
    centers, *_ = activate(padded)
    cl = build_clusters(np.asarray(padded.centers), mask=np.asarray(mask),
                        group=args.group)
    n_valid = jnp.sum(mask.astype(jnp.float32))

    def xla_fb(carry, i):
        l, g = jax.value_and_grad(
            lambda c: cluster_repulsion(c, cl, mask, n_valid))(
                centers + carry * 0.0)
        return carry + l * 0.0 + g[0, 0]

    print(f"xla fwd+bwd            : "
          f"{timed(scan_wrap(xla_fb), jnp.zeros(())):7.3f} ms")

    for bc in (8, 16, 32):
        for ff in ("member", "monopole"):
            fn = functools.partial(rk.cluster_repulsion_fused, block_c=bc,
                                   far_field=ff)

            def fb(carry, i, fn=fn):
                l, g = jax.value_and_grad(
                    lambda c: fn(c, cl, mask, n_valid))(centers + carry * 0.0)
                return carry + l * 0.0 + g[0, 0]

            print(f"fused f+b bc={bc:<3} {ff:<8}: "
                  f"{timed(scan_wrap(fb), jnp.zeros(())):7.3f} ms")

    def fwd_only(carry, i):
        return carry + rk.cluster_repulsion_fused(
            centers + carry * 0.0, cl, mask, n_valid) * 0.0

    print(f"fused fwd only         : "
          f"{timed(scan_wrap(fwd_only), jnp.zeros(())):7.3f} ms")

    def xla_fwd(carry, i):
        return carry + cluster_repulsion(
            centers + carry * 0.0, cl, mask, n_valid) * 0.0

    print(f"xla fwd only           : "
          f"{timed(scan_wrap(xla_fwd), jnp.zeros(())):7.3f} ms")

    # Kernel only: precompute plane inputs once outside the loop, then
    # fwd+bwd through _rep_call itself.
    member_idx = cl.member_idx
    member_valid = cl.member_valid & jnp.take(mask.astype(bool), member_idx)
    c_count, g = member_idx.shape
    cs = jnp.take(centers, member_idx.reshape(-1), axis=0).reshape(
        c_count, g, 3)
    w = member_valid.astype(jnp.float32)
    counts = jnp.sum(w, axis=1)
    centroids = (jnp.sum(cs * w[..., None], axis=1)
                 / jnp.maximum(counts, 1.0)[:, None])
    w_near = 8
    cd2 = jnp.sum((centroids[:, None, :] - centroids[None, :, :]) ** 2,
                  axis=2)
    cd2 = jnp.where((counts > 0)[None, :], cd2, jnp.inf)
    _, nb = jax.lax.top_k(-cd2, w_near)
    nb_members = jnp.take(member_idx, nb, axis=0).reshape(c_count,
                                                          w_near * g)
    nb_cs = jnp.take(cs, nb, axis=0).reshape(c_count, w_near * g, 3)
    nb_w = jnp.take(w, nb, axis=0).reshape(c_count, w_near * g)
    far_w = ((1.0 - jnp.sum(jax.nn.one_hot(nb, c_count, dtype=jnp.float32),
                            axis=1)) * counts[None, :])
    wg = w_near * g
    wg_pad = rk._round_up(max(wg, rk._LANE), rk._LANE)
    c_all_pad = rk._round_up(max(c_count, rk._LANE), rk._LANE)

    for bc in (8, 16, 32):
        bc_eff = rk._auto_block_c(bc, c_count, g, c_all_pad, wg_pad)
        c_pad = rk._round_up(c_count, bc_eff)

        def planes(x, rows, cols):
            t = jnp.moveaxis(x, 2, 0)
            return jnp.pad(t, ((0, 0), (0, rows - t.shape[1]),
                               (0, cols - t.shape[2])))

        cs_p = planes(cs, c_pad, g)
        nbcs_p = planes(nb_cs, c_pad, wg_pad)
        cents_p = jnp.pad(centroids.T[:, None, :],
                          ((0, 0), (0, 0), (0, c_all_pad - c_count)))

        def pad2(x, rows, cols, value=0.0):
            return jnp.pad(x, ((0, rows - x.shape[0]),
                               (0, cols - x.shape[1])),
                           constant_values=value)

        w_p = pad2(w, c_pad, g)
        nbw_p = pad2(nb_w, c_pad, wg_pad)
        mi_p = pad2(member_idx.astype(jnp.int32), c_pad, g, value=-1)
        nbm_p = pad2(nb_members.astype(jnp.int32), c_pad, wg_pad, value=-2)
        fw_p = pad2(far_w, c_pad, c_all_pad)

        def kern(carry, i, cs_p=cs_p, nbcs_p=nbcs_p, cents_p=cents_p,
                 w_p=w_p, nbw_p=nbw_p, mi_p=mi_p, nbm_p=nbm_p, fw_p=fw_p,
                 bc_eff=bc_eff):
            def f(a):
                return rk._rep_call(a, nbcs_p, cents_p, w_p, nbw_p, mi_p,
                                    nbm_p, fw_p, bc_eff, False, True)

            l, gr = jax.value_and_grad(f)(cs_p + carry * 0.0)
            return carry + l * 0.0 + gr[0, 0, 0]

        print(f"kernel-only f+b bc={bc_eff:<3}: "
              f"{timed(scan_wrap(kern), jnp.zeros(())):7.3f} ms")


if __name__ == "__main__":
    main()
