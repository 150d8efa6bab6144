"""Fused march + normal-taps Pallas kernel for the tile-culled renderer.

The culled training path (render/culled.py) marches each ray tile against
its own top-K primitive table. Under plain XLA the march's [B, T, K]
distance/exp intermediates round-trip HBM on every one of the 40 serial
steps (~3 x B*T*K*4 bytes x 40 — the measured wall at M~50k: the culled
train step is HBM-bound, not compute-bound). This kernel is the culled
twin of ops/pallas/march_shade_kernel.py: one ray sub-tile plus its tile's
[5, K] table stay resident in VMEM for all 47 detached field evaluations
(num_steps march + 1 reattach + 6 normal taps; reference
renderer_diff.rs:22-26,41-46, scene.rs:81-128).

Grid: (B tiles, T/tile_t sub-tiles), sub-tile minor — consecutive programs
share the same table block so Mosaic skips re-fetching it. Outputs t and
normal are detached by construction (the march carries no gradients,
reference renderer_diff.rs:25); the gradient-carrying reattach/compositor/
mask evaluations stay in XLA in render/culled.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from burn_raymarching_tpu.ops.march import T_MAX

_LANE = 128
_TILE_T = 512
# Same per-program VMEM working-set budget as the dense kernels: ~4 live
# [tile_t, K] f32 intermediates.
_VMEM_TILE_BUDGET = 6 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_tile(tile_t: int, t: int, k_pad: int) -> int:
    tile = min(tile_t, _round_up(t, 8))
    while tile > 8 and tile * k_pad * 4 * 4 > _VMEM_TILE_BUDGET:
        tile //= 2
    return max(tile, 8)


def _soft_min_rows(p, centers, radius, c_sq, k):
    """Reference LogSumExp soft-min (sdf.rs:30-44) of [T, 3] points vs a
    [*, K] table. Op order matches render/culled._tile_dists +
    _tile_soft_min exactly (d first, then * -k) so the kernel is
    bit-compatible with the XLA culled path it replaces."""
    p_sq = jnp.sum(p * p, axis=1, keepdims=True)
    p_dot_c = jnp.dot(p, centers, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    d = jnp.sqrt(jnp.maximum(p_sq + c_sq - 2.0 * p_dot_c, 1e-6)) - radius
    val = d * (-k)
    mx = jnp.max(val, axis=1, keepdims=True)
    s = jnp.sum(jnp.exp(val - mx), axis=1, keepdims=True)
    return (jnp.log(jnp.maximum(s, 1e-8)) + mx) / (-k)


def _culled_march_kernel(ro_ref, rd_ref, t0_ref, prim_ref, k_ref,
                         t_ref, n_ref, *, num_steps: int, normal_eps: float):
    """prim: [1, 5, K] rows cx, cy, cz, radius, ||c||^2 (1e30 in invalid
    slots, pushing them out of the soft-min exactly)."""
    ro = ro_ref[0]                                    # [T, 3]
    rd = rd_ref[0]
    centers = prim_ref[0, 0:3, :]                     # [3, K]
    radius = prim_ref[0, 3:4, :]                      # [1, K]
    c_sq = prim_ref[0, 4:5, :]
    k = k_ref[0, 0]

    def sdf(p):
        return _soft_min_rows(p, centers, radius, c_sq, k)

    def body(_, t):
        sm = sdf(ro + rd * t)
        return jnp.minimum(t + sm, T_MAX)

    t = jax.lax.fori_loop(0, num_steps, body, t0_ref[0])
    t_ref[0] = t

    # Detached reattach point -> p_final (renderer_diff.rs:28-38, detached).
    p_approx = ro + rd * t
    dist_last = sdf(p_approx)
    p_final = ro + rd * (t + dist_last)

    # 6-tap central-difference normals (scene.rs:81-128), eps = 1e-4;
    # offsets built by a scalar column shift (kernels cannot capture
    # constant arrays). The +1e-6 INSIDE the normalization sqrt is the
    # reference quirk the goldens depend on.
    def tap(axis, sign):
        cols = [p_final[:, i:i + 1] for i in range(3)]
        cols[axis] = cols[axis] + sign * normal_eps
        return sdf(jnp.concatenate(cols, axis=1))

    dx = tap(0, 1.0) - tap(0, -1.0)
    dy = tap(1, 1.0) - tap(1, -1.0)
    dz = tap(2, 1.0) - tap(2, -1.0)
    normal = jnp.concatenate([dx, dy, dz], axis=1)    # [T, 3]
    length = jnp.sqrt(jnp.sum(normal * normal, axis=1, keepdims=True) + 1e-6)
    n_ref[0] = normal / length


@functools.partial(jax.jit, static_argnames=("num_steps", "tile_t",
                                             "normal_eps", "interpret"))
def _culled_march_impl(ro, rd, t0, prim, k_arr, num_steps, tile_t,
                       normal_eps, interpret):
    b, t_dim = ro.shape[0], ro.shape[1]
    k_dim = prim.shape[2]
    kernel = functools.partial(_culled_march_kernel, num_steps=num_steps,
                               normal_eps=normal_eps)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, t_dim, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t_dim, 3), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            # Sub-tile minor: programs (i, 0..n_sub) share the same prim
            # block, so its DMA is skipped on all but the first.
            grid=(b, t_dim // tile_t),
            in_specs=[
                pl.BlockSpec((1, tile_t, 3), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t, 3), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 5, k_dim), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tile_t, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t, 3), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (num_steps + 7) * b * t_dim * k_dim * 10,
            bytes_accessed=b * t_dim * 4 * 10 + b * 5 * k_dim * 4,
            transcendentals=2 * (num_steps + 7) * b * t_dim * k_dim,
        ),
        interpret=interpret,
    )(ro, rd, t0, prim, k_arr)


def culled_march_normals_pallas(
    ray_org: jax.Array,      # [B, T, 3] tile-coherent rays
    ray_dir: jax.Array,      # [B, T, 3]
    centers_t: jax.Array,    # [B, K, 3] gathered per-tile tables
    radii_t: jax.Array,      # [B, K]
    c_sq_t: jax.Array,       # [B, K], 1e30 in invalid slots
    smooth_k,
    num_steps: int = 40,
    normal_eps: float = 1e-4,
    t_init: Optional[jax.Array] = None,   # [B, T, 1] warm-start roots
    tile_t: int = _TILE_T,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused detached culled march + normals -> (t [B,T,1], normal [B,T,3]).

    Numerically identical to the XLA march + _tile_normals in
    render/culled.py (same expanded-form distances, soft-min epsilons and
    T_MAX cap); verified in tests/test_culled_kernel.py. Table gathering
    (ops/culling.gather_tile_tables) stays outside — this kernel only
    replaces the serial detached field evaluations.
    """
    ray_org = jax.lax.stop_gradient(ray_org)
    ray_dir = jax.lax.stop_gradient(ray_dir)
    centers_t = jax.lax.stop_gradient(centers_t)
    radii_t = jax.lax.stop_gradient(radii_t)
    c_sq_t = jax.lax.stop_gradient(c_sq_t)
    smooth_k = jnp.asarray(jax.lax.stop_gradient(smooth_k), jnp.float32)

    b, t_dim = ray_org.shape[0], ray_org.shape[1]
    k_dim = centers_t.shape[1]
    k_pad = _round_up(max(k_dim, _LANE), _LANE)
    tile = _auto_tile(tile_t, t_dim, k_pad)
    t_pad = _round_up(t_dim, tile)

    def pad_rays(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((0, 0), (0, t_pad - t_dim), (0, 0)))

    ro = pad_rays(ray_org)
    rd = pad_rays(ray_dir)
    t0 = (jnp.zeros((b, t_pad, 1), jnp.float32) if t_init is None
          else pad_rays(jax.lax.stop_gradient(t_init)
                        .astype(jnp.float32).reshape(b, t_dim, 1)))

    dk = k_pad - k_dim
    c_p = jnp.pad(centers_t.astype(jnp.float32), ((0, 0), (0, dk), (0, 0)))
    r_p = jnp.pad(radii_t.astype(jnp.float32), ((0, 0), (0, dk)))
    q_p = jnp.pad(c_sq_t.astype(jnp.float32), ((0, 0), (0, dk)),
                  constant_values=1e30)
    prim = jnp.concatenate(
        [jnp.swapaxes(c_p, 1, 2), r_p[:, None, :], q_p[:, None, :]],
        axis=1)                                                # [B, 5, K]
    k_arr = smooth_k.reshape(1, 1)

    t, normal = _culled_march_impl(ro, rd, t0, prim, k_arr, num_steps,
                                   tile, normal_eps, interpret)
    return t[:, :t_dim], normal[:, :t_dim]
