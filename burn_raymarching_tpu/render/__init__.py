from burn_raymarching_tpu.render.diff import render_diff  # noqa: F401
from burn_raymarching_tpu.render.gt import render_gt  # noqa: F401
