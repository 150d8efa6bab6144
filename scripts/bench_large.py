"""Large-scene (config 4-5 style) train-step benchmark on one chip.

Times the FULL culled training step (selection + march + normals + shade/
composite + 5-term loss with cluster repulsion + backward + Adam update)
through the Trainer's own jitted scan chunk, for three march backends:

  * xla    — the in-renderer XLA fori_loop march (HBM round-trips per step);
  * kernel — the fused culled Pallas march+normals kernel, cold 40 steps;
  * warm   — the kernel warm-started from the per-pixel t cache
             (cfg.warm_steps instead of 40).

Usage (TPU):
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/bench_large.py --m 51200 --variants xla,kernel,warm

Numbers recorded in docs/PARITY.md ("Large-scene path").
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


def make_dataset(n_pixels: int, seed: int = 0):
    from burn_raymarching_tpu.data.camera import create_camera_rays
    from burn_raymarching_tpu.data.dataset import RayDataset

    side = 256
    ro, rd = create_camera_rays(side, side, [0.0, 0.5, -2.5], [0, 0, 0], 50.0)
    reps = max(1, n_pixels // (side * side))
    ro = jnp.tile(ro, (reps, 1))
    rd = jnp.tile(rd, (reps, 1))
    tgt = jnp.clip(jnp.abs(rd), 0, 1)
    return RayDataset(ro, rd, tgt)


def make_params(m: int, seed: int = 0):
    from burn_raymarching_tpu.models.scene import init_scene_params, pad_params

    rng = np.random.default_rng(seed)
    params = init_scene_params(m)
    params.centers = jnp.asarray(rng.uniform(-0.8, 0.8, (m, 3)), jnp.float32)
    params.radii = jnp.asarray(rng.normal(-4.0, 0.3, (m, 1)), jnp.float32)
    params.colors = jnp.asarray(rng.normal(0, 0.5, (m, 3)), jnp.float32)
    return pad_params(params, m)


def bench_variant(cfg, ds, padded, mask, variant: str, steps: int, reps: int):
    from burn_raymarching_tpu.ops.culling import build_clusters
    from burn_raymarching_tpu.train.loop import Trainer

    tr = Trainer(cfg, ds, log=lambda s: None)
    if variant == "xla":
        tr.culled_march_normal_fn = None
    elif tr.culled_march_normal_fn is None:
        from burn_raymarching_tpu.ops.pallas.culled_march_kernel import (
            culled_march_normals_pallas,
        )

        tr.culled_march_normal_fn = culled_march_normals_pallas
    tr.warm = variant == "warm"
    if not tr.warm:
        tr.t_cache = None
    tr._chunk = steps
    tr._step_fn = tr._build_step()

    cl_idx = jnp.zeros((0, 0), jnp.int32)
    cl_valid = jnp.zeros((0, 0), bool)
    if (cfg.cull_hierarchical and cfg.use_culling) or cfg.cluster_repulsion:
        cl = build_clusters(np.asarray(padded.centers),
                            mask=np.asarray(mask),
                            group=cfg.cull_cluster_group)
        cl_idx, cl_valid = cl.member_idx, cl.member_valid

    if tr.warm:
        t0p = time.perf_counter()
        tr.t_cache = jnp.zeros((ds.num_total_pixels,), jnp.float32)
        tr.prefill_t_cache(padded, mask, cfg.max_smooth_k)
        np.asarray(tr.t_cache)
        prefill_s = time.perf_counter() - t0p
    else:
        prefill_s = 0.0
    t_cache = (tr.t_cache if tr.t_cache is not None
               else jnp.zeros((0,), jnp.float32))

    opt_state = tr.tx.init(padded)
    stage = jnp.asarray(4, jnp.int32)

    def run(key):
        return tr._step_fn(padded, opt_state, key, mask, ds.packed,
                           ds.fg_indices, ds.n_fg, t_cache, stage,
                           jnp.asarray(0, jnp.int32), cl_idx, cl_valid)

    # Warmup/compile.
    out = run(jax.random.PRNGKey(0))
    np.asarray(out[3])
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(r + 1))
        losses = np.asarray(out[3])
        best = min(best, (time.perf_counter() - t0) / steps)
    assert np.isfinite(losses).all(), f"non-finite loss in {variant}"
    return best, cfg.batch_size / best, prefill_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=51200)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--hier", action="store_true", default=True)
    ap.add_argument("--no-hier", dest="hier", action="store_false")
    ap.add_argument("--warm-steps", type=int, default=16)
    ap.add_argument("--variants", default="xla,kernel,warm")
    ap.add_argument("--rep-far-field", dest="rep_far", default="member",
                    choices=["member", "monopole"])
    args = ap.parse_args()

    from burn_raymarching_tpu.config import LossConfig, TrainConfig

    cfg = TrainConfig(
        loss=LossConfig(repulsion_far_field=args.rep_far),
        batch_size=args.batch, use_culling=True, cull_budget=args.budget,
        cull_tile=args.tile, cull_hierarchical=args.hier,
        cull_cluster_group=64, cull_cluster_budget=32,
        cluster_repulsion=True, weight_decay_mode="decoupled",
        warm_start=True, warm_steps=args.warm_steps,
        steps_per_call=args.steps, checkpoint_dir=None,
    )
    ds = make_dataset(10 * 256 * 256)
    padded, mask = make_params(args.m)
    print(f"M={args.m} batch={args.batch} budget={args.budget} "
          f"tile={args.tile} hier={args.hier} backend={jax.default_backend()}")
    for variant in args.variants.split(","):
        best, rays, prefill_s = bench_variant(
            cfg, ds, padded, mask, variant.strip(), args.steps, args.reps)
        extra = f" (prefill {prefill_s:.2f}s)" if prefill_s else ""
        print(f"{variant:>7}: {best * 1e3:7.2f} ms/step "
              f"{rays / 1e6:6.2f} Mrays/s{extra}", flush=True)


if __name__ == "__main__":
    main()
