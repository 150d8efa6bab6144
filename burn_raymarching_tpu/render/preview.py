"""Tiled (chunked) inference rendering for previews and offline viewing.

Reference: save_tiled_preview (src/bin/train.rs:335-366) renders in
4096-ray chunks to bound memory. Same chunking here, but all chunks of a
render run inside ONE device program (lax.map over [n_chunks, chunk, 3]) —
on this environment each program launch costs ~32 ms through the tunneled
runtime, so per-chunk dispatch made a 256² eval ~16× slower than the
actual compute (and the polish loop pays a full PSNR eval per round).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from burn_raymarching_tpu.models.scene import SceneParams, scene_forward


@partial(jax.jit, static_argnames=("march_fn", "march_normal_fn",
                                   "softmax_sharpness", "mask_sharpness"))
def _forward_chunks(params, ro3, rd3, smooth_k, mask, march_fn,
                    march_normal_fn, softmax_sharpness=10.0,
                    mask_sharpness=15.0):
    """[K, chunk, 3] rays → [K, chunk, 3] colors, one device program."""

    def one(args):
        ro, rd = args
        return scene_forward(params, ro, rd, smooth_k, mask=mask,
                             march_fn=march_fn,
                             march_normal_fn=march_normal_fn,
                             softmax_sharpness=softmax_sharpness,
                             mask_sharpness=mask_sharpness)

    return jax.lax.map(one, (ro3, rd3))


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
    sk = jnp.asarray(smooth_k, dtype=jnp.float32)
    k = (n + chunk - 1) // chunk
    pad = k * chunk - n
    ro3 = jnp.pad(jnp.asarray(rays_o), ((0, pad), (0, 0))).reshape(
        k, chunk, 3)
    rd3 = jnp.pad(jnp.asarray(rays_d), ((0, pad), (0, 0))).reshape(
        k, chunk, 3)
    out = _forward_chunks(params, ro3, rd3, sk, mask, march_fn,
                          march_normal_fn,
                          softmax_sharpness=softmax_sharpness,
                          mask_sharpness=mask_sharpness)
    return np.asarray(out).reshape(k * chunk, 3)[:n]
