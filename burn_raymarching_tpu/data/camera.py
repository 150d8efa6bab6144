"""Pinhole look-at camera → per-pixel ray origins and directions.

Same camera math as the reference (src/camera.rs:30-90: world_up=[0,1,0],
forward/right/up basis, fov → half_height = tan(fov/2), v flipped so +y is up,
uv measured at the pixel's top-left corner), but fully vectorized — the
reference builds the rays in a scalar CPU loop and uploads; here it's a
device-side jitted computation (rays land directly in HBM).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _look_at_basis(eye: np.ndarray, target: np.ndarray):
    """Camera basis (reference: src/camera.rs:40-44)."""
    fwd = target - eye
    n = np.linalg.norm(fwd)
    forward = fwd / n if n > 0 else np.zeros(3)
    world_up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, world_up)
    n = np.linalg.norm(right)
    right = right / n if n > 0 else np.zeros(3)
    up = np.cross(right, forward)
    return forward, right, up


@partial(jax.jit, static_argnums=(0, 1))
def _ray_dirs(width: int, height: int, basis: jax.Array, half_wh: jax.Array):
    """Vectorized per-pixel directions. basis: [3,3] rows (right, up, fwd)."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    u = (x / width) * 2.0 - 1.0                       # reference camera.rs:62
    v = -((y / height) * 2.0 - 1.0)                   # y-flip, camera.rs:63
    uu, vv = jnp.meshgrid(u, v, indexing="xy")        # [H, W]
    r_scale = (uu * half_wh[0]).reshape(-1, 1)        # [N, 1]
    u_scale = (vv * half_wh[1]).reshape(-1, 1)
    d = (r_scale * basis[0][None, :]
         + u_scale * basis[1][None, :]
         + basis[2][None, :])                          # [N, 3]
    return d / jnp.linalg.norm(d, axis=1, keepdims=True)


def create_camera_rays(
    width: int,
    height: int,
    eye,
    target,
    fov_deg: float,
):
    """Returns (ray_org [H*W,3], ray_dir [H*W,3]) in row-major pixel order.

    Reference: src/camera.rs:30-90.
    """
    eye = np.asarray(eye, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    forward, right, up = _look_at_basis(eye, target)

    aspect = width / height
    half_height = np.tan(np.radians(fov_deg) / 2.0)
    half_width = aspect * half_height

    basis = jnp.asarray(np.stack([right, up, forward]), dtype=jnp.float32)
    half_wh = jnp.asarray([half_width, half_height], dtype=jnp.float32)
    ray_dir = _ray_dirs(width, height, basis, half_wh)
    ray_org = jnp.broadcast_to(jnp.asarray(eye)[None, :], ray_dir.shape)
    return ray_org, ray_dir
