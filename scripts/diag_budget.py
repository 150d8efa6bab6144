"""How much does the top-K cull budget corrupt the M=51k forward?

Evaluates the SAME config-5 init scene at several cull budgets (flat
selection, the eval path) and reports PSNR vs the targets — if PSNR keeps
rising with budget, the round-1 budget (256) was starving both the eval and
the training gradients. Also prints overflow telemetry per budget.
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
    p.add_argument("--init-n", dest="init_n", type=int, default=51200)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--budgets", default="256,1024,4096")
    p.add_argument("--prior", default="points", choices=["points", "dense"])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from burn_raymarching_tpu.data.camera import create_camera_rays
    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.models.scene import (
        activate,
        init_scene_params_cloud,
        pad_params,
    )
    from burn_raymarching_tpu.ops.culling import (
        selection_overflow,
        tile_cones,
    )
    from burn_raymarching_tpu.ops.pallas.culled_march_kernel import (
        culled_march_normals_pallas,
    )
    from burn_raymarching_tpu.render.preview import CullRender
    from burn_raymarching_tpu.tools import generate
    from burn_raymarching_tpu.train.evaluate import evaluate_views
    from burn_raymarching_tpu.utils.padding import bucket_size

    if args.prior == "dense":
        dense_c, _, _ = generate.knot_scene(args.init_n)
        pts = np.asarray(dense_c, np.float32).reshape(-1, 3)
        jitter = 0.0
    else:
        pts = np.asarray(
            json.load(open(os.path.join(args.data, "points.json")))["points"],
            np.float32).reshape(-1, 3)
        jitter = 0.02

    cams = load_cameras(os.path.join(args.data, "cameras.json"))[: args.views]
    tgts = [load_image_as_array(c["file"]) for c in cams]

    init = init_scene_params_cloud(args.init_n, seed=0, points=pts,
                                   jitter=jitter)
    padded, mask = pad_params(init, bucket_size(args.init_n))
    centers_p, _, radii_p, _, _ = activate(padded)

    # Overflow on the first view's rays.
    ro, rd = create_camera_rays(256, 256, cams[0]["origin"],
                                cams[0]["target"], cams[0]["fov"])
    cones = tile_cones(jnp.asarray(ro), jnp.asarray(rd), 512)

    for budget in [int(b) for b in args.budgets.split(",")]:
        ovf = np.asarray(selection_overflow(
            cones, centers_p, radii_p, jnp.float32(128.0), budget,
            mask=mask))
        t0 = time.perf_counter()
        res = evaluate_views(
            padded, cams, tgts, 256, 256, mask=mask, smooth_k=128.0,
            softmax_sharpness=40.0, mask_sharpness=60.0,
            march_normal_fn=None,
            cull=CullRender(tile=512, k_budget=budget,
                            march_normal_fn=culled_march_normals_pallas))
        print(f"budget {budget:5d}: PSNR {res['mean']:.2f} dB "
              f"(min {res['min']:.2f}) | overflow mean {ovf.mean():.0f} "
              f"max {ovf.max()} tiles>0 {(ovf > 0).mean() * 100:.0f}% "
              f"[{time.perf_counter() - t0:.0f}s]")


if __name__ == "__main__":
    main()
