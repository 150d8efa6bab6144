"""Fused Barnes-Hut cluster-repulsion kernel (custom VJP).

train/loss.cluster_repulsion approximates the reference's O(M^2) pairwise
repulsion (reference src/training.rs:73-83) with an exact near field over
each cluster's W nearest clusters plus centroid monopoles for the far
field. Its XLA form materializes the [C, G, W*G] near-field and
[M, C] far-field tensors in HBM on the forward AND backward pass — at
M=51,200 that is ~5.1 ms of an 8.9 ms train step (the measured wall,
docs/PARITY.md).

This kernel computes both fields per cluster-block entirely in VMEM, and
— crucially for TPU — **coordinate-split on the VPU**: the 3-wide dot
products of the expanded-form distance are degenerate MXU shapes (K=3
pads to a full 128-lane tile, ~40x wasted MACs; a first MXU-based
version of this kernel measured *slower* than the XLA graph it
replaced). Instead each coordinate plane is an elementwise broadcast:

  d2 = (x_i - x_j)^2 + (y_i - y_j)^2 + (z_i - z_j)^2    on [Bc,G,WG]

  * near: member<->gathered-neighbor-member distances [Bc, G, WG],
    reference +100 self-pair offset from integer id equality;
  * far: member-to-centroid distances [Bc, G, C_all] weighted by the
    per-cluster (1 - near) * counts row.

The backward pass recomputes the forward quantities on-chip (recompute
VJP — no [.., W*G] residuals in HBM) and emits d_members, d_neighbor
members and d_centroids, also as pure VPU broadcast-reduce chains; the
differentiable prep (member gather, centroids, top-k neighbor selection,
far weights) stays OUTSIDE the custom_vjp so reverse AD routes those
gradients back through the gathers and the centroid means exactly as in
the XLA version.

Sharded M (model_axis) keeps the XLA path — the all-gather/psum combine
lives there (train/loss.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Per-program VMEM working set: a few [Bc*G, C_all] f32 live arrays.
_VMEM_TILE_BUDGET = 24 * 1024 * 1024
# The backward recompute keeps near + far live arrays simultaneously
# (~18 MB at bc=8, M=51k) — above Mosaic's 16 MB default scoped limit,
# well under the 128 MB of VMEM on v5e.
_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_block_c(block_c: int, c_count: int, g: int, c_all: int,
                  wg: int) -> int:
    bc = min(block_c, c_count)
    while bc > 8 and bc * g * max(c_all, wg) * 4 * 6 > _VMEM_TILE_BUDGET:
        bc //= 2
    # Mosaic requires the second-to-last block dim of the [C, G]-shaped
    # operands be a multiple of 8 (or the whole axis).
    if c_count >= 8:
        bc = max((bc // 8) * 8, 8)
    return max(bc, 1)


def _near_d2(cs, nb_cs):
    """[Bc, G, WG] coordinate deltas + squared distance (VPU broadcasts).

    cs: [3, Bc, G]; nb_cs: [3, Bc, WG]. Returns (dx, dy, dz, d2).
    """
    dx = cs[0][:, :, None] - nb_cs[0][:, None, :]
    dy = cs[1][:, :, None] - nb_cs[1][:, None, :]
    dz = cs[2][:, :, None] - nb_cs[2][:, None, :]
    return dx, dy, dz, dx * dx + dy * dy + dz * dz


def _far_d2(cs, cents):
    """[Bc, G, C_all] member-to-centroid deltas + squared distance.

    cs: [3, Bc, G]; cents: [3, 1, C_all].
    """
    dx = cs[0][:, :, None] - cents[0][None, :, :]
    dy = cs[1][:, :, None] - cents[1][None, :, :]
    dz = cs[2][:, :, None] - cents[2][None, :, :]
    return dx, dy, dz, dx * dx + dy * dy + dz * dz


def _weights_and_denoms(d2, extra):
    live = (d2 > 1e-6).astype(jnp.float32)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-6))
    denom = dist + extra + 1e-6
    return live, dist, denom


def _rep_fwd_kernel(cs_ref, nbcs_ref, cents_ref, w_ref, nbw_ref, mi_ref,
                    nbm_ref, fw_ref, out_ref, *, include_far):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cs = cs_ref[:]                                            # [3, Bc, G]
    w = w_ref[:]                                              # [Bc, G]

    # --- near field ---
    _, _, _, d2 = _near_d2(cs, nbcs_ref[:])
    self_pair = (mi_ref[:][:, :, None] ==
                 nbm_ref[:][:, None, :]).astype(jnp.float32)
    _, _, denom = _weights_and_denoms(d2, self_pair * 100.0)
    cw = w[:, :, None] * nbw_ref[:][:, None, :]
    s = jnp.sum(cw / denom)

    # --- far field (member→centroid; skipped under far_field="monopole",
    # where the tiny [C, C] term lives in plain XLA outside the kernel) ---
    if include_far:
        _, _, _, d2f = _far_d2(cs, cents_ref[:])
        _, _, denom_f = _weights_and_denoms(d2f, 0.0)
        fw = w[:, :, None] * fw_ref[:][:, None, :]            # [Bc, G, C]
        s = s + jnp.sum(fw / denom_f)

    # Full-block store — Mosaic cannot store scalars to VMEM.
    out_ref[:] = out_ref[:] + s


def _rep_bwd_kernel(cs_ref, nbcs_ref, cents_ref, w_ref, nbw_ref, mi_ref,
                    nbm_ref, fw_ref, g_ref, dcs_ref, dnbcs_ref, dcents_ref,
                    *, include_far):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dcents_ref[:] = jnp.zeros_like(dcents_ref)

    gbar = g_ref[0, 0]
    cs = cs_ref[:]
    w = w_ref[:]

    # --- near field (recompute) ---
    dx, dy, dz, d2 = _near_d2(cs, nbcs_ref[:])
    self_pair = (mi_ref[:][:, :, None] ==
                 nbm_ref[:][:, None, :]).astype(jnp.float32)
    live, dist, denom = _weights_and_denoms(d2, self_pair * 100.0)
    cw = w[:, :, None] * nbw_ref[:][:, None, :]
    # s = sum cw/denom; d s/d csx = -cw/denom^2 * dx/dist  (per pair)
    coef = (-gbar) * cw / (denom * denom * dist) * live       # [Bc, G, WG]
    cdx, cdy, cdz = coef * dx, coef * dy, coef * dz
    d_cs_near = jnp.stack([jnp.sum(cdx, axis=2), jnp.sum(cdy, axis=2),
                           jnp.sum(cdz, axis=2)])             # [3, Bc, G]
    dnbcs_ref[:] = -jnp.stack([jnp.sum(cdx, axis=1), jnp.sum(cdy, axis=1),
                               jnp.sum(cdz, axis=1)])         # [3, Bc, WG]

    # --- far field (recompute) ---
    if not include_far:
        dcs_ref[:] = d_cs_near
        return
    dxf, dyf, dzf, d2f = _far_d2(cs, cents_ref[:])
    live_f, dist_f, denom_f = _weights_and_denoms(d2f, 0.0)
    fw = w[:, :, None] * fw_ref[:][:, None, :]
    coef_f = (-gbar) * fw / (denom_f * denom_f * dist_f) * live_f
    fdx, fdy, fdz = coef_f * dxf, coef_f * dyf, coef_f * dzf
    dcs_ref[:] = d_cs_near + jnp.stack(
        [jnp.sum(fdx, axis=2), jnp.sum(fdy, axis=2), jnp.sum(fdz, axis=2)])
    dcents_ref[:] = dcents_ref[:] - jnp.stack(
        [jnp.sum(fdx, axis=(0, 1))[None, :],
         jnp.sum(fdy, axis=(0, 1))[None, :],
         jnp.sum(fdz, axis=(0, 1))[None, :]])                 # [3, 1, C]


def _specs(bc, g, wg, c_all):
    def blk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    return [
        blk((3, bc, g), lambda i: (0, i, 0)),          # cs planes
        blk((3, bc, wg), lambda i: (0, i, 0)),         # nb_cs planes
        blk((3, 1, c_all), lambda i: (0, 0, 0)),       # centroid planes
        blk((bc, g), lambda i: (i, 0)),                # w
        blk((bc, wg), lambda i: (i, 0)),               # nb_w
        blk((bc, g), lambda i: (i, 0)),                # member ids
        blk((bc, wg), lambda i: (i, 0)),               # neighbor ids
        blk((bc, c_all), lambda i: (i, 0)),            # far weights
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _rep_call(cs, nb_cs, cents, w, nb_w, mi, nbm, fw, block_c, interpret,
              include_far=True):
    out, _ = _rep_call_fwd(cs, nb_cs, cents, w, nb_w, mi, nbm, fw, block_c,
                           interpret, include_far)
    return out


def _rep_call_fwd(cs, nb_cs, cents, w, nb_w, mi, nbm, fw, block_c,
                  interpret, include_far=True):
    c_count, g = cs.shape[1], cs.shape[2]
    wg = nb_cs.shape[2]
    c_all = cents.shape[2]
    out = pl.pallas_call(
        functools.partial(_rep_fwd_kernel, include_far=include_far),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(c_count // block_c,),
            in_specs=_specs(block_c, g, wg, c_all),
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(cs, nb_cs, cents, w, nb_w, mi, nbm, fw)
    return out[0, 0], (cs, nb_cs, cents, w, nb_w, mi, nbm, fw)


def _rep_call_bwd(block_c, interpret, include_far, res, gbar):
    cs, nb_cs, cents, w, nb_w, mi, nbm, fw = res
    c_count, g = cs.shape[1], cs.shape[2]
    wg = nb_cs.shape[2]
    c_all = cents.shape[2]
    g_arr = jnp.asarray(gbar, jnp.float32).reshape(1, 1)
    d_cs, d_nbcs, d_cents = pl.pallas_call(
        functools.partial(_rep_bwd_kernel, include_far=include_far),
        out_shape=(
            jax.ShapeDtypeStruct((3, c_count, g), jnp.float32),
            jax.ShapeDtypeStruct((3, c_count, wg), jnp.float32),
            jax.ShapeDtypeStruct((3, 1, c_all), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(c_count // block_c,),
            in_specs=_specs(block_c, g, wg, c_all) + [
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((3, block_c, g), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, block_c, wg), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 1, c_all), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(cs, nb_cs, cents, w, nb_w, mi, nbm, fw, g_arr)
    zeros = jnp.zeros_like
    return (d_cs, d_nbcs, d_cents, zeros(w), zeros(nb_w), zeros(mi),
            zeros(nbm), zeros(fw))


_rep_call.defvjp(_rep_call_fwd, _rep_call_bwd)


def cluster_repulsion_fused(
    centers: jax.Array,       # [M, 3]
    clusters,                 # ops.culling.PrimitiveClusters
    mask: Optional[jax.Array],
    n_valid,
    near_clusters: int = 8,
    block_c: int = 8,
    interpret: bool = False,
    far_field: str = "member",
    static=None,              # train/loss.RepulsionStatic (per-chunk frozen)
) -> jax.Array:
    """Drop-in TPU replacement for train/loss.cluster_repulsion (same
    near/far decomposition, same epsilons and +100 self-pair offset); the
    heavy [C,G,W·G] + [M,C] field evaluations run in VMEM with a
    recompute-based custom VJP. Verified against the XLA version in
    tests/test_repulsion_kernel.py.

    far_field="monopole" drops the member→centroid far field from the
    kernel and adds the centroid↔centroid monopole sum ([C, C], tiny) in
    plain XLA instead — ~G× fewer far pairs, one more approximation order
    (see train/loss.cluster_repulsion).

    The prep below intentionally mirrors train/loss.cluster_repulsion
    line-for-line so gradients through the member gather, the centroid
    means and the neighbor selection are identical. ``static`` freezes the
    non-differentiable half of that prep (top-k neighbors, validity,
    counts, far weights — train/loss.RepulsionStatic) between refreshes;
    the differentiable member/neighbor positions and centroids are always
    recomputed live, and the neighbor gather collapses to ONE direct
    take(centers, nbm_idx) instead of the chained member-then-neighbor
    gathers (identical value and gradient).
    """
    member_idx = clusters.member_idx
    c_count, g = member_idx.shape
    if static is not None:
        w = static.w
        counts = static.counts
        w_near = static.nb.shape[1]
        nb_members = static.nbm_idx                           # [C, W·G]
        nb_w = static.nb_w
        far_w = static.far_w
        cs = jnp.take(centers, member_idx.reshape(-1), axis=0).reshape(
            c_count, g, 3)
        centroids = (jnp.sum(cs * w[..., None], axis=1)
                     / jnp.maximum(counts, 1.0)[:, None])     # [C, 3]
        # Block-structured neighbor gather (whole [G,3] blocks) — the
        # flattened take(centers, nbm_idx) equivalent costs ~2x the whole
        # step in tiny row gathers on TPU, and the one-hot-matmul VJP
        # (ops/static_gather.take_blocks) measured 6.85 -> 7.32 ms on the
        # M=51k warm step — both negatives; see train/loss.py.
        nb_cs = jnp.take(cs, static.nb, axis=0).reshape(
            c_count, w_near * g, 3)
        cd2 = None
    else:
        member_valid = clusters.member_valid
        if mask is not None:
            member_valid = member_valid & jnp.take(mask.astype(bool),
                                                   member_idx)
        cs = jnp.take(centers, member_idx.reshape(-1), axis=0).reshape(
            c_count, g, 3)
        w = member_valid.astype(centers.dtype)                # [C, G]
        counts = jnp.sum(w, axis=1)                           # [C]
        centroids = (jnp.sum(cs * w[..., None], axis=1)
                     / jnp.maximum(counts, 1.0)[:, None])     # [C, 3]
        w_near = min(near_clusters, c_count)

        cd2 = jnp.sum((centroids[:, None, :] - centroids[None, :, :]) ** 2,
                      axis=2)
        cd2 = jnp.where((counts > 0)[None, :], cd2, jnp.inf)
        _, nb = jax.lax.top_k(-cd2, w_near)                   # [C, W]

        nb_members = jnp.take(member_idx, nb, axis=0).reshape(c_count,
                                                              w_near * g)
        nb_cs = jnp.take(cs, nb, axis=0).reshape(c_count, w_near * g, 3)
        nb_w = jnp.take(w, nb, axis=0).reshape(c_count, w_near * g)
        near_hot = jnp.sum(jax.nn.one_hot(nb, c_count, dtype=centers.dtype),
                           axis=1)                            # [C, C]
        far_w = (1.0 - near_hot) * counts[None, :]            # [C, C_all]

    # Pad: neighbor columns to a lane multiple (zero weight), cluster rows
    # to the block size (zero weight rows contribute exactly nothing), the
    # centroid/far axis to a lane multiple (zero far weight columns).
    wg = w_near * g
    wg_pad = _round_up(max(wg, _LANE), _LANE)
    c_all_pad = _round_up(max(c_count, _LANE), _LANE)
    bc = _auto_block_c(block_c, c_count, g, c_all_pad, wg_pad)
    c_pad = _round_up(c_count, bc)

    def pad2(x, rows, cols, value=0.0):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])),
                       constant_values=value)

    def planes(x, rows, cols):
        """[R, K, 3] -> coordinate planes [3, rows, cols] (zero padded)."""
        t = jnp.moveaxis(x, 2, 0)                             # [3, R, K]
        return jnp.pad(t, ((0, 0), (0, rows - t.shape[1]),
                           (0, cols - t.shape[2])))

    cs_p = planes(cs, c_pad, g)
    nbcs_p = planes(nb_cs, c_pad, wg_pad)
    cents_p = jnp.pad(centroids.T[:, None, :],
                      ((0, 0), (0, 0), (0, c_all_pad - c_count)))
    w_p = pad2(w, c_pad, g)
    nbw_p = pad2(nb_w, c_pad, wg_pad)
    # Padded id slots get distinct negatives so no spurious self-pairs.
    mi_p = pad2(member_idx.astype(jnp.int32), c_pad, g, value=-1)
    nbm_p = pad2(nb_members.astype(jnp.int32), c_pad, wg_pad, value=-2)
    fw_p = pad2(far_w, c_pad, c_all_pad)

    include_far = far_field != "monopole"
    s = _rep_call(cs_p, nbcs_p, cents_p, w_p, nbw_p, mi_p, nbm_p, fw_p,
                  bc, interpret, include_far)
    if not include_far:
        # Monopole far field in plain XLA — [C, C] is a few hundred KB even
        # at M=51k, and reverse AD through it routes centroid gradients back
        # through the same differentiable prep as the member mode. On the
        # static path the centroid distances must stay LIVE (only the
        # top-k/weights are frozen), so recompute them with the same
        # empty-cluster masking.
        if cd2 is None:
            cd2 = jnp.sum(
                (centroids[:, None, :] - centroids[None, :, :]) ** 2, axis=2)
            cd2 = jnp.where((counts > 0)[None, :], cd2, jnp.inf)
        dist_cc = jnp.sqrt(jnp.maximum(cd2, 1e-6))
        inv_cc = 1.0 / (dist_cc + 1e-6)
        s = s + jnp.sum(far_w * counts[:, None] * inv_cc)
    return s / (n_valid * n_valid)
