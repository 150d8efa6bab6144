"""Per-component timing of the culled train step at large M (one chip).

Each component runs in its own 100-iteration lax.scan (amortizing the ~32 ms
tunnel dispatch and the ~0.23 ms/iteration scan floor) with the result
threaded through the carry so nothing is DCE'd. Numbers feed the
optimization notes in docs/PARITY.md / CLAUDE.md.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/profile_culled.py --m 51200 --budget 256
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--warm-steps", type=int, default=16)
    args = ap.parse_args()

    from burn_raymarching_tpu.data.dataset import (
        gather_batch,
        sample_batch_indices,
    )
    from burn_raymarching_tpu.models.scene import activate
    from burn_raymarching_tpu.ops.culling import (
        build_clusters,
        select_tile_primitives,
        select_tile_primitives_hier,
        tile_cones,
    )
    from burn_raymarching_tpu.ops.pallas.culled_march_kernel import (
        culled_march_normals_pallas,
    )
    from burn_raymarching_tpu.render.culled import render_diff_culled
    from burn_raymarching_tpu.train.loss import cluster_repulsion

    from bench_large import make_dataset, make_params  # noqa: E402

    m, batch, tile, budget = args.m, args.batch, args.tile, args.budget
    b = batch // tile
    ds = make_dataset(10 * 256 * 256)
    padded, mask = make_params(m)
    centers_p, colors_p, radii_p, light_p, amb_p = activate(padded)
    cl = build_clusters(np.asarray(padded.centers), mask=np.asarray(mask),
                        group=64)
    k = jnp.float32(32.0)
    key = jax.random.PRNGKey(0)

    # --- sampling + gather ---
    def samp(carry, i, packed, fg, n_fg):
        idx = sample_batch_indices(jax.random.fold_in(key, i),
                                   packed.shape[0], fg, n_fg, batch,
                                   jnp.float32(0.6))
        idx = jnp.sort(idx)
        ro, rd, tgt = gather_batch(packed, idx)
        return carry + ro[0] + rd[0] + tgt[0]

    t_ms = timed(scan_wrap(samp), jnp.zeros(3), ds.packed, ds.fg_indices,
                 ds.n_fg)
    print(f"sample+sort+gather      : {t_ms:7.3f} ms")

    idx = jnp.sort(sample_batch_indices(key, ds.packed.shape[0],
                                        ds.fg_indices, ds.n_fg, batch,
                                        jnp.float32(0.6)))
    ro, rd, tgt = gather_batch(ds.packed, idx)
    ro3 = ro.reshape(b, tile, 3)
    rd3 = rd.reshape(b, tile, 3)

    # --- selection (flat + hier) ---
    def sel_flat(carry, i, ro, rd):
        cones = tile_cones(ro, rd, tile)
        ti, tv = select_tile_primitives(cones, centers_p + carry * 0.0,
                                        radii_p, k, budget, mask=mask)
        return carry + ti[0, 0].astype(jnp.float32)

    print(f"select flat             : "
          f"{timed(scan_wrap(sel_flat), jnp.zeros(()), ro, rd):7.3f} ms")

    def sel_hier(carry, i, ro, rd):
        cones = tile_cones(ro, rd, tile)
        ti, tv = select_tile_primitives_hier(
            cones, centers_p + carry * 0.0, radii_p, k, budget, cl, 32,
            mask=mask)
        return carry + ti[0, 0].astype(jnp.float32)

    print(f"select hier             : "
          f"{timed(scan_wrap(sel_hier), jnp.zeros(()), ro, rd):7.3f} ms")

    cones = tile_cones(ro, rd, tile)
    idx_t, valid_t = select_tile_primitives_hier(
        cones, centers_p, radii_p, k, budget, cl, 32, mask=mask)

    # --- table gather (detached copy) ---
    def gath(carry, i, idx_t, valid_t):
        cs = jnp.take(centers_p, idx_t, axis=0)
        rs = jnp.take(radii_p.reshape(-1), idx_t, axis=0)
        qs = jnp.where(valid_t, jnp.sum(cs * cs, axis=2), 1e30)
        return carry + cs[0, 0] * rs[0, 0] + qs[0, :3] * 0.0

    print(f"table gather            : "
          f"{timed(scan_wrap(gath), jnp.zeros(3), idx_t, valid_t):7.3f} ms")

    cs = jnp.take(centers_p, idx_t, axis=0)
    rs = jnp.take(radii_p.reshape(-1), idx_t, axis=0)
    qs = jnp.where(valid_t, jnp.sum(cs * cs, axis=2), 1e30)

    # --- march kernel (warm + cold) ---
    for label, steps in (("march kernel warm", args.warm_steps),
                         ("march kernel cold", 40)):
        def march(carry, i, cs, rs, qs, steps=steps):
            t, n = culled_march_normals_pallas(
                ro3, rd3, cs, rs, qs, k, num_steps=steps,
                t_init=jnp.broadcast_to(carry, (b, tile, 1)) * 0.0)
            return carry + t[0, 0] * 0.0 + n[0, 0, 0]

        print(f"{label:<24}: "
              f"{timed(scan_wrap(march), jnp.zeros(1), cs, rs, qs):7.3f} ms")

    t, normal = culled_march_normals_pallas(ro3, rd3, cs, rs, qs, k,
                                            num_steps=40)

    # --- grad tail (render with precomputed + L1 loss, fwd+bwd) ---
    def tail(carry, i, t, normal):
        def loss_fn(p):
            c_p, col_p, r_p, ld_p, a_p = activate(p)
            out = render_diff_culled(
                ro, rd, c_p, col_p, r_p, ld_p, a_p, k, mask=mask, tile=tile,
                k_budget=budget, precomputed=(idx_t, valid_t, t, normal))
            return jnp.mean(jnp.abs(out - tgt))

        l, g = jax.value_and_grad(loss_fn)(padded)
        return jax.tree.map(lambda a, b_: a + 1e-9 * b_, carry, g), None

    @jax.jit
    def tail_run(carry, t, normal):
        c, _ = jax.lax.scan(lambda c, i: tail(c, i, t, normal), carry,
                            jnp.arange(STEPS))
        return c

    z = jax.tree.map(jnp.zeros_like, padded)
    print(f"shade tail fwd+bwd      : {timed(tail_run, z, t, normal):7.3f} ms")

    # --- cluster repulsion fwd+bwd ---
    n_valid = jnp.sum(mask.astype(jnp.float32))

    def rep(carry, i):
        def loss_fn(c):
            return cluster_repulsion(c, cl, mask, n_valid)

        l, g = jax.value_and_grad(loss_fn)(centers_p + carry * 0.0)
        return carry + l * 0.0 + g[0, 0]

    print(f"cluster repulsion f+b   : "
          f"{timed(scan_wrap(rep), jnp.zeros(()),):7.3f} ms")

    # --- fused (Pallas) cluster repulsion fwd+bwd ---
    from burn_raymarching_tpu.ops.pallas.repulsion_kernel import (
        cluster_repulsion_fused,
    )

    def rep_fused(carry, i):
        def loss_fn(c):
            return cluster_repulsion_fused(c, cl, mask, n_valid)

        l, g = jax.value_and_grad(loss_fn)(centers_p + carry * 0.0)
        return carry + l * 0.0 + g[0, 0]

    print(f"cluster repulsion fused : "
          f"{timed(scan_wrap(rep_fused), jnp.zeros(()),):7.3f} ms")

    # --- t-cache scatter ---
    tc = jnp.zeros((ds.num_total_pixels,), jnp.float32)

    def scat(carry, i, idx):
        return carry.at[idx].set(jnp.arange(batch, dtype=jnp.float32))

    print(f"t-cache scatter         : "
          f"{timed(scan_wrap(scat), tc, idx):7.3f} ms")


if __name__ == "__main__":
    main()
