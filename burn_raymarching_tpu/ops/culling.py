"""Coherent-tile primitive culling for large scenes.

Dense soft-min is O(N·M) — fine for the reference's hundreds of primitives,
ruinous at 5k-50k (BASELINE configs 4-5). The TPU-native fix: rays in a tile
share a bounding cone; any primitive farther than ``cutoff = margin/k`` from
the cone (beyond its radius) contributes less than exp(-margin) ≈ 2.7e-10
relative to the soft-min/softmax sums — *below fp32 resolution*, so culling
it is exact in f32. Each tile then marches against its own top-K primitive
table instead of all M.

Coherence comes for free in rendering (pixel tiles) and from SORTING the
sampled batch indices in training (sampling is with replacement and the
loss is a batch mean, so reordering changes nothing).

Selection runs once per step as cheap dense [n_tiles, M] geometry (no
transcendentals); the 47 per-step field evaluations then cost O(N·K).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# exp(-22) ≈ 2.7e-10: dropped terms are below f32 resolution of the sums.
CULL_MARGIN = 22.0


class TileCones(NamedTuple):
    apex: jax.Array          # [B, 3] mean ray origin per tile
    axis: jax.Array          # [B, 3] unit mean direction
    cos_half: jax.Array      # [B] cos of the bounding half-angle
    origin_spread: jax.Array  # [B] max |origin - apex| (cutoff inflation)


def tile_cones(ray_org: jax.Array, ray_dir: jax.Array, tile: int) -> TileCones:
    """Bounding cones of consecutive ray tiles. N must divide by ``tile``."""
    n = ray_org.shape[0]
    b = n // tile
    ro = ray_org.reshape(b, tile, 3)
    rd = ray_dir.reshape(b, tile, 3)
    apex = jnp.mean(ro, axis=1)
    axis = jnp.mean(rd, axis=1)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=1, keepdims=True), 1e-12)
    cos_half = jnp.min(jnp.sum(rd * axis[:, None, :], axis=2), axis=1)
    # A near-degenerate tile (rays spanning >90°) gets cos_half <= 0: the
    # cone test below degrades to keep-everything, which is safe.
    spread = jnp.max(jnp.linalg.norm(ro - apex[:, None, :], axis=2), axis=1)
    return TileCones(apex, axis, jnp.clip(cos_half, -1.0, 1.0), spread)


def cone_point_distance(cones: TileCones, points: jax.Array) -> jax.Array:
    """Distance from each point to each tile's cone → [B, M].

    Standard point-to-cone: with v = p - apex, α the angle between v and the
    axis, θ the half-angle: inside (α ≤ θ) → 0; else |v|·sin(min(α-θ, π/2)).
    The origin spread is subtracted by the caller via the cutoff.
    """
    v = points[None, :, :] - cones.apex[:, None, :]          # [B, M, 3]
    length = jnp.linalg.norm(v, axis=2)                       # [B, M]
    proj = jnp.sum(v * cones.axis[:, None, :], axis=2)        # [B, M]
    cosa = jnp.clip(proj / jnp.maximum(length, 1e-12), -1.0, 1.0)
    alpha = jnp.arccos(cosa)
    theta = jnp.arccos(cones.cos_half)[:, None]
    outside = jnp.clip(alpha - theta, 0.0, jnp.pi / 2)
    d = length * jnp.sin(outside)
    return jnp.where(length < 1e-9, 0.0, d)


def select_tile_primitives(
    cones: TileCones,
    centers: jax.Array,       # [M, 3]
    radii: jax.Array,         # [M, 1] physical
    smooth_k: jax.Array | float,
    k_budget: int,
    mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-K primitive indices per tile → (idx [B, K], valid [B, K]).

    Keeps primitives whose cone distance (minus radius and origin spread) is
    within CULL_MARGIN/k; when more than K qualify, the K nearest are kept
    (the overflow terms are the weakest contributors).
    """
    d = cone_point_distance(cones, centers)                   # [B, M]
    cutoff = CULL_MARGIN / smooth_k + cones.origin_spread[:, None]
    score = d - radii.reshape(1, -1)
    keep = score <= cutoff
    if mask is not None:
        keep = keep & mask[None, :].astype(bool)
    # Rank by score with culled entries pushed to +inf.
    ranked = jnp.where(keep, score, jnp.inf)
    k_budget = min(k_budget, centers.shape[0])
    neg_top, idx = jax.lax.top_k(-ranked, k_budget)           # [B, K]
    valid = jnp.isfinite(-neg_top)
    return idx.astype(jnp.int32), valid


def selection_overflow(
    cones: TileCones,
    centers: jax.Array,
    radii: jax.Array,
    smooth_k: jax.Array | float,
    k_budget: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-tile count of qualifying primitives dropped by the K budget.

    Nonzero overflow means the render is no longer f32-exact: the dropped
    terms are the weakest qualifiers, with relative contribution up to
    exp(-k * (their score - best score)). Diffuse clouds (many primitives at
    comparable distance) need larger budgets than surface-structured scenes.
    """
    d = cone_point_distance(cones, centers)
    cutoff = CULL_MARGIN / smooth_k + cones.origin_spread[:, None]
    keep = (d - radii.reshape(1, -1)) <= cutoff
    if mask is not None:
        keep = keep & mask[None, :].astype(bool)
    counts = jnp.sum(keep.astype(jnp.int32), axis=1)
    return jnp.maximum(counts - k_budget, 0)


def gather_tile_tables(
    centers: jax.Array,   # [M, 3]
    colors: jax.Array,    # [M, 3]
    radii: jax.Array,     # [M, 1]
    idx: jax.Array,       # [B, K]
    valid: jax.Array,     # [B, K]
):
    """Per-tile primitive tables.

    Returns (centers_t [B,K,3], colors_t [B,K,3], radii_t [B,K],
    c_sq_t [B,K] with 1e30 in invalid slots).
    """
    centers_t = jnp.take(centers, idx, axis=0)                # [B, K, 3]
    colors_t = jnp.take(colors, idx, axis=0)
    radii_t = jnp.take(radii.reshape(-1), idx, axis=0)        # [B, K]
    c_sq = jnp.sum(centers_t * centers_t, axis=2)
    c_sq = jnp.where(valid, c_sq, 1e30)
    return centers_t, colors_t, radii_t, c_sq
