"""Synthetic dataset generator — renders GT targets + cameras.json.

Equivalent of the reference's generate binary (src/bin/generate.rs:20-112):
three "dango" spheres (red/green/blue at x = -0.3/0/0.3, r = 0.2/0.15/0.2),
10 cameras (8-ring at radius 2.5 / y=0.5, one top with the z=-0.001 nudge,
one from below), rendered with the non-differentiable GT renderer and saved
through the gamma-2.2 pipeline.

Usage: python -m burn_raymarching_tpu.tools.generate [--out data] [--size 256]
"""

from __future__ import annotations

import argparse
import math
import os


def default_cameras(out_dir: str = "data", fov: float = 50.0,
                    radius: float = 2.5) -> list[dict]:
    """The reference's 10-camera rig (generate.rs:43-80)."""
    cams = []
    for i in range(8):
        angle = i * (2.0 * math.pi / 8)
        cams.append({
            "file": f"{out_dir}/target_{i}.png",
            "origin": [radius * math.cos(angle), 0.5,
                       radius * math.sin(angle)],
            "target": [0.0, 0.0, 0.0],
            "fov": fov,
        })
    # Top view, z nudged to dodge the degenerate up-vector cross product.
    cams.append({"file": f"{out_dir}/target_8.png",
                 "origin": [0.0, 2.5, -0.001],
                 "target": [0.0, 0.0, 0.0], "fov": fov})
    cams.append({"file": f"{out_dir}/target_9.png",
                 "origin": [0.0, -1.5, -2.0],
                 "target": [0.0, 0.0, 0.0], "fov": fov})
    return cams


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="data")
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from burn_raymarching_tpu.data.camera import create_camera_rays
    from burn_raymarching_tpu.data.image_io import save_array_as_image
    from burn_raymarching_tpu.data.scene_io import save_cameras
    from burn_raymarching_tpu.render.gt import render_gt

    # GT scene (generate.rs:29-40).
    centers = jnp.asarray([[-0.3, 0.0, 0.0], [0.0, 0.0, 0.0],
                           [0.3, 0.0, 0.0]], jnp.float32)
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                          [0.0, 0.0, 1.0]], jnp.float32)
    radii = jnp.asarray([[0.2], [0.15], [0.2]], jnp.float32)

    cams = default_cameras(args.out)
    os.makedirs(args.out, exist_ok=True)
    print(f"Generating {len(cams)} target images...")
    import jax

    render = jax.jit(render_gt)
    for cam in cams:
        print(f"  -> Rendering {cam['file']}")
        ro, rd = create_camera_rays(args.size, args.size, cam["origin"],
                                    cam["target"], cam["fov"])
        img = render(ro, rd, centers, colors, radii)
        save_array_as_image(img, args.size, args.size, cam["file"])

    save_cameras(cams, os.path.join(args.out, "cameras.json"))
    print(f"🎉 Done! All images and {args.out}/cameras.json generated.")


if __name__ == "__main__":
    main()
