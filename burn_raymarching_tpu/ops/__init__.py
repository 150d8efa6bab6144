from burn_raymarching_tpu.ops.sdf import (  # noqa: F401
    sphere_sdf,
    smooth_min,
    soft_min,
    pairwise_sphere_dists,
    scene_sdf,
    scene_normal,
)
