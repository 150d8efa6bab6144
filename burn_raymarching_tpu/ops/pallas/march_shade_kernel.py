"""Fused march + normal-taps Pallas kernel.

The training forward does 49 [N, M] distance-field evaluations per step:
40 march + 1 detached reattach point + 6 normal taps + (with gradients) 1
reattach + 1 compositor + 1 mask (reference renderer_diff.rs:22-33,
scene.rs:104-111). The first 47 carry NO gradients — the march is detached
and normals are computed at a detached point with detached params. This
kernel runs all 47 in one pallas_call per ray tile, entirely in VMEM:

  * 40-step sphere-tracing march (t capped like ops.march.T_MAX);
  * optional early exit: a tile stops marching once every ray has either
    converged (|step| < tol) or left the scene bound (t > miss t-threshold);
    the reference's remaining steps add ~0 for converged rays and only move
    already-missed rays (coverage saturates to exactly 0 either way);
  * one extra detached SDF eval at the converged point → detached t_final
    → p_final for the normals;
  * the 6-tap central-difference normals (scene.rs:81-128 semantics).

Grid over ray tiles; the primitive table ([4, M] rows cx, cy, cz, r + the
precomputed ||c||^2 row with 1e30 in masked slots) is small enough to stay
fully resident.

Outputs: t [N, 1], normal [N, 3] — both detached by construction. The
gradient-carrying reattach/compositor/mask evals stay in XLA where reverse
AD handles them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# 1024-ray tiles measured ~15% faster than 512 on v5e at M=128 (the serial
# march can't fill the VPU with short tiles); _auto_tile still shrinks the
# tile as M grows.
_TILE_N = 1024
_T_MAX = 1e4     # ops.march.T_MAX
_MISS_T = 40.0   # any ray past this t can no longer hit a |c|<=1.2+r scene
_CONV_TOL = 1e-5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Per-tile VMEM working-set budget. The kernel keeps ~4 live [tile_n, M]
# f32 intermediates (distances, exps, plus compiler temps); tiles shrink
# automatically as the primitive table grows so M up to ~100k fits without
# an M-tiling loop (rays are the long axis — a short tile of 8 rows still
# fills the 8-sublane fp32 register tile).
_VMEM_TILE_BUDGET = 6 * 1024 * 1024


def _auto_tile(tile_n: int, n: int, m_pad: int) -> int:
    tile = min(tile_n, _round_up(n, 8))
    while tile > 8 and tile * m_pad * 4 * 4 > _VMEM_TILE_BUDGET:
        tile //= 2
    return max(tile, 8)


def _soft_min_rows(p, centers, kr, c_sq, k):
    """Exact reference soft-min of a [T, 3] point block vs the [*, M] table.

    Returns [T, 1]. LogSumExp with row max (sdf.rs:30-44). The K=3
    point-center contraction rides the MXU; the radius row arrives
    pre-scaled as k*r so val = -k*d is one fused multiply-add. (Summing the
    exps with a ones-matmul on the MXU was tried and is slower — the serial
    march can't hide the per-step matmul latency — and a full-precision MXU
    sum needs 3 passes; the VPU lane reduce wins.)
    """
    p_sq = jnp.sum(p * p, axis=1, keepdims=True)
    p_dot_c = jnp.dot(p, centers, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    q = jnp.maximum(p_sq + c_sq - 2.0 * p_dot_c, 1e-6)
    val = jnp.sqrt(q) * (-k) + kr                  # == -k * (sqrt(q) - r)
    mx = jnp.max(val, axis=1, keepdims=True)
    s = jnp.sum(jnp.exp(val - mx), axis=1, keepdims=True)
    return (jnp.log(jnp.maximum(s, 1e-8)) + mx) / (-k)


def _march_shade_kernel(ro_ref, rd_ref, t0_ref, prim_ref, csq_ref, k_ref,
                        t_ref, n_ref, *, num_steps: int, early_exit: bool,
                        normal_eps: float):
    ro = ro_ref[:]
    rd = rd_ref[:]
    centers = prim_ref[0:3, :]
    radius = prim_ref[3:4, :]
    c_sq = csq_ref[:]
    k = k_ref[0, 0]
    kr = radius * k                                    # [1, M]

    def sdf(p):
        return _soft_min_rows(p, centers, kr, c_sq, k)

    if early_exit:
        def cond(carry):
            i, _, active = carry
            return jnp.logical_and(i < num_steps, active)

        def body(carry):
            i, t, _ = carry
            sm = sdf(ro + rd * t)
            t = jnp.minimum(t + sm, _T_MAX)
            live = jnp.logical_and(jnp.abs(sm) > _CONV_TOL, t < _MISS_T)
            return i + 1, t, jnp.any(live)

        t0 = t0_ref[:]
        _, t, _ = jax.lax.while_loop(cond, body, (0, t0, jnp.bool_(True)))
    else:
        def body(_, t):
            sm = sdf(ro + rd * t)
            return jnp.minimum(t + sm, _T_MAX)

        t = jax.lax.fori_loop(0, num_steps, body, t0_ref[:])

    t_ref[:] = t

    # Detached reattach point → p_final (renderer_diff.rs:28-38, detached).
    p_approx = ro + rd * t
    dist_last = sdf(p_approx)
    p_final = ro + rd * (t + dist_last)

    # 6-tap central-difference normals (scene.rs:81-128), eps = 1e-4.
    # Offsets are built by shifting one coordinate column with a scalar add
    # (pallas kernels cannot capture constant arrays).
    def tap(axis, sign):
        cols = [p_final[:, i:i + 1] for i in range(3)]
        cols[axis] = cols[axis] + sign * normal_eps
        return sdf(jnp.concatenate(cols, axis=1))

    dx = tap(0, 1.0) - tap(0, -1.0)
    dy = tap(1, 1.0) - tap(1, -1.0)
    dz = tap(2, 1.0) - tap(2, -1.0)
    normal = jnp.concatenate([dx, dy, dz], axis=1)          # [T, 3]
    length = jnp.sqrt(jnp.sum(normal * normal, axis=1, keepdims=True) + 1e-6)
    n_ref[:] = normal / length


@functools.partial(jax.jit, static_argnames=("num_steps", "tile_n",
                                             "early_exit", "normal_eps",
                                             "interpret"))
def _march_shade_impl(ro, rd, t0, prim, c_sq, k_arr, num_steps, tile_n,
                      early_exit, normal_eps, interpret):
    n = ro.shape[0]
    m = prim.shape[1]
    kernel = functools.partial(_march_shade_kernel, num_steps=num_steps,
                               early_exit=early_exit, normal_eps=normal_eps)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(n // tile_n,),
            in_specs=[
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (num_steps + 7) * n * m * 10,
            bytes_accessed=n * 4 * 10 + m * 4 * 5,
            transcendentals=2 * (num_steps + 7) * n * m,
        ),
        interpret=interpret,
    )(ro, rd, t0, prim, c_sq, k_arr)


def march_shade_pallas(
    ray_org: jax.Array,
    ray_dir: jax.Array,
    centers: jax.Array,
    radii: jax.Array,
    smooth_k,
    mask: Optional[jax.Array] = None,
    num_steps: int = 40,
    normal_eps: float = 1e-4,
    tile_n: int = _TILE_N,
    early_exit: bool = False,
    interpret: bool = False,
    t_init: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused detached march + normals → (t [N,1], normal [N,3]).

    ``t_init`` warm-starts the march (see ops.march.march_xla); pair with a
    reduced ``num_steps``.
    """
    ray_org = jax.lax.stop_gradient(ray_org)
    ray_dir = jax.lax.stop_gradient(ray_dir)
    centers = jax.lax.stop_gradient(centers)
    radii = jax.lax.stop_gradient(radii)
    smooth_k = jnp.asarray(jax.lax.stop_gradient(smooth_k), jnp.float32)

    n = ray_org.shape[0]
    m = centers.shape[0]
    m_pad = _round_up(max(m, _LANE), _LANE)
    if m_pad > 32768:
        # Even the minimum 8-ray tile overflows VMEM past ~32k primitives
        # (measured on v5e). Scenes that large should march per-tile top-K
        # tables instead: render/culled.py (+ ops/culling clusters).
        raise ValueError(
            f"dense march kernel supports M <= 32768 (got {m}); use the "
            "culled renderer (render_diff_culled) for large scenes")
    tile = _auto_tile(tile_n, n, m_pad)
    n_pad = _round_up(n, tile)

    ro = jnp.pad(ray_org.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    rd = jnp.pad(ray_dir.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    if t_init is None:
        t0 = jnp.zeros((n_pad, 1), jnp.float32)
    else:
        t0 = jnp.pad(
            jax.lax.stop_gradient(t_init).astype(jnp.float32).reshape(-1, 1),
            ((0, n_pad - n), (0, 0)))

    valid = jnp.arange(m_pad) < m
    if mask is not None:
        valid = valid & jnp.pad(mask.astype(bool), (0, m_pad - m))
    c = jnp.pad(centers.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    r = jnp.pad(radii.astype(jnp.float32).reshape(-1), (0, m_pad - m))
    prim = jnp.concatenate([c.T, r[None, :]], axis=0)
    c_sq = jnp.sum(c * c, axis=1)[None, :]
    c_sq = jnp.where(valid[None, :], c_sq, 1e30)
    k_arr = smooth_k.reshape(1, 1)

    t, normal = _march_shade_impl(ro, rd, t0, prim, c_sq, k_arr, num_steps,
                                  tile, early_exit, normal_eps, interpret)
    return t[:n], normal[:n]
