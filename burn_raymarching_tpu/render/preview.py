"""Tiled (chunked) inference rendering for previews and offline viewing.

Reference: save_tiled_preview (src/bin/train.rs:335-366) renders in
4096-ray chunks to bound memory. Same here, with a jitted chunk renderer
(one compile, H*W/chunk executions).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np

from burn_raymarching_tpu.models.scene import SceneParams, scene_forward


@partial(jax.jit, static_argnames=("march_fn", "march_normal_fn",
                                   "softmax_sharpness", "mask_sharpness"))
def _forward_chunk(params, ro, rd, smooth_k, mask, march_fn, march_normal_fn,
                   softmax_sharpness=10.0, mask_sharpness=15.0):
    return scene_forward(params, ro, rd, smooth_k, mask=mask,
                         march_fn=march_fn, march_normal_fn=march_normal_fn,
                         softmax_sharpness=softmax_sharpness,
                         mask_sharpness=mask_sharpness)


def render_tiled(
    params: SceneParams,
    rays_o,
    rays_d,
    smooth_k: float = 32.0,
    mask: Optional[jax.Array] = None,
    chunk: int = 4096,
    march_fn=None,
    march_normal_fn=None,
    softmax_sharpness: float = 10.0,
    mask_sharpness: float = 15.0,
) -> np.ndarray:
    """Render [P, 3] rays in fixed-size chunks → np.float32 [P, 3]."""
    from burn_raymarching_tpu.ops.march import march_xla

    if march_fn is None:
        march_fn = march_xla
    n = rays_o.shape[0]
    sk = jax.numpy.asarray(smooth_k, dtype=jax.numpy.float32)
    outs = []
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        ro = rays_o[start:end]
        rd = rays_d[start:end]
        pad = 0
        if end - start < chunk:  # pad tail chunk to keep one compiled shape
            pad = chunk - (end - start)
            ro = jax.numpy.pad(ro, ((0, pad), (0, 0)))
            rd = jax.numpy.pad(rd, ((0, pad), (0, 0)))
        out = _forward_chunk(params, ro, rd, sk, mask, march_fn,
                             march_normal_fn,
                             softmax_sharpness=softmax_sharpness,
                             mask_sharpness=mask_sharpness)
        outs.append(np.asarray(out)[: end - start])
    return np.concatenate(outs, axis=0)
