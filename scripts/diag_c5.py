"""Config-5 flatness diagnostics (round 2, VERDICT item 1).

Round-1 config-5 training was flat (+0.02 dB over init; the dense-prior
control regressed). This script isolates WHERE learning stalls at M=51k:

  * loss trace every 100 steps (does the optimizer see progress at all?)
  * per-parameter-group movement (are colors/light moving, or only noise?)
  * PSNR on an 8-view subset before/after (fast proxy for the 100-view eval)
  * culling telemetry (selection/cluster overflow) on the init scene

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/diag_c5.py [--steps 300] [--prior dense] \
        [--lr-scales 0.001,1,0.1,0.5] [--views 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_tpu")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="runs/c5/data")
    p.add_argument("--out", default="runs/diag")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--init-n", dest="init_n", type=int, default=51200)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prior", default="dense", choices=["points", "dense"])
    p.add_argument("--lr-scales", dest="lr_scales", default="0.001,1,0.1,0.5",
                   help="centers,colors,radii,light")
    p.add_argument("--base-lr", dest="base_lr", type=float, default=0.02)
    p.add_argument("--no-culling", action="store_true")
    p.add_argument("--cull-budget", dest="cull_budget", type=int, default=256)
    p.add_argument("--cluster-budget", dest="cluster_budget", type=int,
                   default=32)
    p.add_argument("--sample-mode", dest="sample_mode", default="pixel",
                   choices=["pixel", "tile"])
    p.add_argument("--no-hier", action="store_true",
                   help="flat per-tile selection (tile-mode batches have "
                   "few cones; flat top-K over all M is cheap)")
    p.add_argument("--no-repulsion", action="store_true")
    p.add_argument("--no-warm", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_raymarching_tpu.config import (
        LossConfig,
        RenderConfig,
        TrainConfig,
    )
    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.models.scene import (
        init_scene_params_cloud,
        pad_params,
    )
    from burn_raymarching_tpu.tools import generate
    from burn_raymarching_tpu.train.evaluate import evaluate_views
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset
    from burn_raymarching_tpu.utils.padding import bucket_size

    os.makedirs(args.out, exist_ok=True)
    lr_sc = [float(x) for x in args.lr_scales.split(",")]

    if args.prior == "dense":
        dense_c, _, _ = generate.knot_scene(args.init_n)
        pts = np.asarray(dense_c, np.float32).reshape(-1, 3)
        jitter = 0.0
    else:
        pts = np.asarray(
            json.load(open(os.path.join(args.data, "points.json")))["points"],
            np.float32).reshape(-1, 3)
        jitter = 0.02

    cfg = TrainConfig(
        batch_size=16384, width=256, height=256,
        stages=1, steps_per_stage=args.steps,
        base_lr=args.base_lr, seed=args.seed,
        init_n=args.init_n, init_layout="cloud",
        warm_start=not args.no_warm, use_fused_shade=True,
        use_culling=not args.no_culling, cull_budget=args.cull_budget,
        dataset_order="morton", sample_mode=args.sample_mode,
        cull_hierarchical=not args.no_culling and not args.no_hier,
        cull_cluster_budget=args.cluster_budget,
        cluster_repulsion=not args.no_repulsion,
        init_points_jitter=jitter,
        weight_decay_mode="decoupled",
        min_smooth_k=128.0, max_smooth_k=128.0,
        lr_scale_centers=lr_sc[0], lr_scale_colors=lr_sc[1],
        lr_scale_radii=lr_sc[2], lr_scale_light=lr_sc[3],
        render=RenderConfig(softmax_sharpness=40.0, mask_sharpness=60.0),
        loss=LossConfig(),
        cameras_json=os.path.join(args.data, "cameras.json"),
        steps_per_call=100 if args.steps % 100 == 0 else 1,
        checkpoint_dir=None,
    )

    cams = load_cameras(cfg.cameras_json)[: args.views]
    tgts = [load_image_as_array(c["file"]) for c in cams]
    dataset = build_dataset(cfg)
    trainer = Trainer(cfg, dataset)

    def psnr(padded, mask):
        return evaluate_views(
            padded, cams, tgts, cfg.width, cfg.height, mask=mask,
            smooth_k=cfg.max_smooth_k,
            march_fn=trainer.march_fn,
            march_normal_fn=trainer.march_normal_fn,
            softmax_sharpness=cfg.render.softmax_sharpness,
            mask_sharpness=cfg.render.mask_sharpness,
            cull=trainer._cull_render())["mean"]

    init = init_scene_params_cloud(
        cfg.init_n, seed=cfg.seed, extent=cfg.init_cloud_extent,
        radius=cfg.init_cloud_radius, ambient_logit=cfg.init_ambient_logit,
        points=pts, jitter=jitter)
    init_pad, init_mask = pad_params(init, bucket_size(cfg.init_n))

    # Culling telemetry on the init scene, one batch of tiles.
    if cfg.use_culling:
        from burn_raymarching_tpu.models.scene import activate
        from burn_raymarching_tpu.ops.culling import (
            select_tile_primitives,
            selection_overflow,
            tile_cones,
        )

        centers_p, _, radii_p, _, _ = activate(init_pad)
        ro = dataset.rays_o[: cfg.batch_size]
        rd = dataset.rays_d[: cfg.batch_size]
        cones = tile_cones(ro, rd, cfg.cull_tile)
        ovf = selection_overflow(cones, centers_p, radii_p,
                                 jnp.float32(cfg.max_smooth_k),
                                 cfg.cull_budget, mask=init_mask)
        ovf = np.asarray(ovf)
        print(f"selection_overflow (init, first batch): "
              f"mean {ovf.mean():.1f}, max {ovf.max()}, "
              f"tiles_overflowing {(ovf > 0).mean() * 100:.0f}%")

    t0 = time.perf_counter()
    p0 = psnr(init_pad, init_mask)
    print(f"init PSNR ({args.views} views): {p0:.2f} dB "
          f"[{time.perf_counter() - t0:.0f}s]")

    key = jax.random.PRNGKey(cfg.seed)
    t0 = time.perf_counter()
    padded, mask, _ = trainer.run_stage(init, 0, key)
    wall = time.perf_counter() - t0

    def delta(a, b):
        return float(jnp.abs(a - b).max()), float(
            jnp.sqrt(jnp.mean((a - b) ** 2)))

    for name in ("centers", "colors", "radii", "light_dir", "ambient"):
        mx, rms = delta(getattr(padded, name), getattr(init_pad, name))
        print(f"  Δ{name}: max {mx:.4f} rms {rms:.5f}")
    print(f"  light_dir: {np.asarray(padded.light_dir).round(3)} "
          f"(init [0, 1, 0]; GT ~[-0.5, 0.5, -1.0])")
    p1 = psnr(padded, mask)
    print(f"trained PSNR ({args.views} views): {p1:.2f} dB "
          f"(init {p0:.2f}, Δ {p1 - p0:+.2f}) [train {wall:.0f}s]")
    json.dump({"init": p0, "trained": p1, "delta": p1 - p0,
               "steps": args.steps, "prior": args.prior,
               "lr_scales": lr_sc, "losses": trainer.loss_history},
              open(os.path.join(args.out, "diag.json"), "w"), indent=1)


if __name__ == "__main__":
    main()
