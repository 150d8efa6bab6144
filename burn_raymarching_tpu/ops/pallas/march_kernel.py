"""Fused Pallas sphere-tracing march kernel.

Why: the march is the dominant cost — 40 serial [N, M] distance-matrix +
soft-min evaluations per training step (reference src/renderer_diff.rs:22-26).
Under plain XLA each iteration's [N, M] intermediate round-trips HBM
(~2 × N×M×4 bytes × 40 steps); this kernel keeps a ray tile and the whole
primitive table resident in VMEM and runs all 40 iterations on-chip, so HBM
traffic collapses to reading the rays once and writing t once.

Layout: primitives are packed as a single [4, M] table (rows: cx, cy, cz,
radius; M padded to a lane multiple) so the per-iteration p·c term is one
[TILE_N, 3] x [3, M] contraction on the MXU and c² / radius are row
broadcasts. Grid over ray tiles only — M (≤ a few thousand) always fits VMEM.

The march is fully detached (gradients re-enter through one reattached SDF
eval outside the kernel), so no custom VJP is needed: the wrapper applies
stop_gradient to everything.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 min tile is (8, 128); rays tile rows, primitives live on lanes.
_LANE = 128
_TILE_N = 512


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


def _march_kernel(ro_ref, rd_ref, prim_ref, csq_ref, k_ref, t_ref, *,
                  num_steps: int):
    """One ray tile: 40 on-chip march iterations.

    ro/rd: [TILE_N, 3]; prim: [4, M] rows (cx, cy, cz, radius) with padded
    columns carrying radius 0 and csq 1e30 (pushed out of the soft-min);
    csq: [1, M] = ||c||^2 with +inf-like pad; k: [1, 1] smooth_k in SMEM.
    """
    ro = ro_ref[:]                       # [T, 3]
    rd = rd_ref[:]                       # [T, 3]
    centers = prim_ref[0:3, :]           # [3, M]
    radius = prim_ref[3:4, :]            # [1, M]
    c_sq = csq_ref[:]                    # [1, M]
    k = k_ref[0, 0]

    def body(_, t):
        p = ro + rd * t                                   # [T, 3]
        p_sq = jnp.sum(p * p, axis=1, keepdims=True)      # [T, 1]
        p_dot_c = jnp.dot(p, centers,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # [T, M]
        d_sq = p_sq + c_sq - 2.0 * p_dot_c
        d = jnp.sqrt(jnp.maximum(d_sq, 1e-6)) - radius    # [T, M]
        # LogSumExp soft-min (reference sdf.rs:30-44). Padded columns have
        # c_sq ~ 1e30 → d huge → exp underflows to 0.
        val = d * (-k)
        mx = jnp.max(val, axis=1, keepdims=True)          # [T, 1]
        s = jnp.sum(jnp.exp(val - mx), axis=1, keepdims=True)
        sm = (jnp.log(jnp.maximum(s, 1e-8)) + mx) / (-k)
        # Same T_MAX cap as ops.march (missed-ray saturation; see march.py).
        return jnp.minimum(t + sm, 1e4)

    t0 = jnp.zeros((ro.shape[0], 1), jnp.float32)
    t_ref[:] = jax.lax.fori_loop(0, num_steps, body, t0)


@functools.partial(jax.jit, static_argnames=("num_steps", "tile_n"))
def _march_pallas_impl(ro, rd, prim, c_sq, smooth_k, num_steps, tile_n):
    n = ro.shape[0]
    m = prim.shape[1]
    grid = (n // tile_n,)
    kernel = functools.partial(_march_kernel, num_steps=num_steps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_steps * n * m * 3 + 8 * num_steps * n * m,
            bytes_accessed=n * 4 * 7 + m * 4 * 5,
            transcendentals=2 * num_steps * n * m,
        ),
    )(ro, rd, prim, c_sq, smooth_k)


def march_pallas(
    ray_org: jax.Array,
    ray_dir: jax.Array,
    centers: jax.Array,
    radii: jax.Array,
    smooth_k,
    mask: Optional[jax.Array] = None,
    num_steps: int = 40,
    tile_n: int = _TILE_N,
    interpret: bool = False,
    model_axis: Optional[str] = None,
) -> jax.Array:
    """Drop-in replacement for ops.march.march_xla on TPU.

    Pads N to the ray-tile size and M to a lane multiple; masked / padded
    primitives are excluded by giving them ||c||^2 = 1e30 so their distance
    is enormous and the soft-min ignores them.

    M-sharded mode (``model_axis``) needs a cross-shard soft-min combine on
    every march step; that path currently falls back to the XLA march, whose
    per-step pmax/psum XLA collectives handle it.
    """
    if model_axis is not None:
        from burn_raymarching_tpu.ops.march import march_xla

        return march_xla(ray_org, ray_dir, centers, radii, smooth_k,
                         mask=mask, num_steps=num_steps,
                         model_axis=model_axis)
    ray_org = jax.lax.stop_gradient(ray_org)
    ray_dir = jax.lax.stop_gradient(ray_dir)
    centers = jax.lax.stop_gradient(centers)
    radii = jax.lax.stop_gradient(radii)
    smooth_k = jnp.asarray(jax.lax.stop_gradient(smooth_k), jnp.float32)

    n = ray_org.shape[0]
    m = centers.shape[0]
    m_pad = _round_up(max(m, _LANE), _LANE)
    tile = _auto_tile(tile_n, n, m_pad)
    n_pad = _round_up(n, tile)

    ro = jnp.pad(ray_org.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    rd = jnp.pad(ray_dir.astype(jnp.float32), ((0, n_pad - n), (0, 0)))

    valid = jnp.arange(m_pad) < m
    if mask is not None:
        valid = valid & jnp.pad(mask.astype(bool), (0, m_pad - m))
    c = jnp.pad(centers.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    r = jnp.pad(radii.astype(jnp.float32).reshape(-1), (0, m_pad - m))
    prim = jnp.concatenate([c.T, r[None, :]], axis=0)        # [4, M]
    c_sq = jnp.sum(c * c, axis=1)[None, :]                   # [1, M]
    c_sq = jnp.where(valid[None, :], c_sq, 1e30)

    k_arr = smooth_k.reshape(1, 1)

    if interpret:
        t = _march_interpret(ro, rd, prim, c_sq, k_arr, num_steps, tile)
    else:
        t = _march_pallas_impl(ro, rd, prim, c_sq, k_arr, num_steps, tile)
    return t[:n]


def _march_interpret(ro, rd, prim, c_sq, k_arr, num_steps, tile):
    """Interpreter-mode pallas_call (CPU verification path)."""
    n, m = ro.shape[0], prim.shape[1]
    kernel = functools.partial(_march_kernel, num_steps=num_steps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, 3), lambda i: (i, 0)),
                pl.BlockSpec((tile, 3), lambda i: (i, 0)),
                pl.BlockSpec((4, m), lambda i: (0, 0)),
                pl.BlockSpec((1, m), lambda i: (0, 0)),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ),
        interpret=True,
    )(ro, rd, prim, c_sq, k_arr)
