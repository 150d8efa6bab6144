"""Derivative-free geometry refinement (stochastic hill-climbing).

The round-3 error decomposition (docs/SCALING.md) shows the trained
large-scene recipes leave 69-84% of their residual error in the silhouette
band while every first-order lever is dead there (pathology 3: sub-pixel
geometry is invisible to Adam — the center-gradient valleys are both
narrow and shallow). This module climbs the loss WITHOUT gradients:
perturb a random subset of (centers, radii), keep the proposal iff the
weighted-L1 loss improves on BOTH of two disjoint fixed ray batches.

Measured on the committed round-3 scenes (scripts/exp_geom_jiggle.py):

  * acceptance batches must be LARGE — two 65k-ray batches overfit at c4
    (proposal loss −20% but full PSNR −0.4 dB); 262k-ray batches
    generalize: c4 27.62 → **27.95**, c5 27.47 → 27.56 (+ the caller's
    full-PSNR gate makes the procedure never-regress);
  * proposals run as chunked lax.scan device programs (64/program — one
    1024-iteration program crashed the TPU worker);
  * the k_budget=4096 proposal program faults the tunneled TPU worker
    DETERMINISTICALLY (measured three times in round 4: twice at
    chunk=64, once at chunk=32 — shorter scans do not help, the
    per-iteration render content does it), while the identical program
    shape at k_budget=2048 is the round-3/4-proven envelope (c4: 512
    tiles × K=2048 × chunk 64, hours of cumulative runtime). So the
    PROPOSAL-LOSS renders cap their budget at ``REFINE_MAX_BUDGET`` —
    legitimate because the two-batch loss is only an acceptance
    *estimator*; the caller's full-PSNR greedy gate (at the full
    configured budget) is what protects correctness. ``_auto_chunk``
    additionally halves the chunk as the (capped) budget doubles past
    2048; pass ``chunk=`` to override.

The reference has no counterpart (its 6-7 fat spheres never hit this
regime); structurally this is the "perturbation escape" arm of 3DGS-MCMC
style refinement, gated greedily instead of sampled.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from burn_raymarching_tpu.config import TrainConfig
from burn_raymarching_tpu.models.scene import SceneParams, activate
from burn_raymarching_tpu.render.culled import render_diff_culled

CHUNK = 64   # proposals per device program (larger programs crash Mosaic)
REFINE_MAX_BUDGET = 2048   # proposal-loss cull budget cap (module docstring)


def _auto_chunk(k_budget: int) -> int:
    """Proposals per device program, scaled so per-program work stays at
    the proven (CHUNK=64, k_budget=2048) envelope — larger single
    programs crash the tunneled TPU worker (module docstring)."""
    return max(8, (CHUNK * 2048) // max(int(k_budget), 2048))


@dataclasses.dataclass
class RefineStats:
    loss_before: float
    loss_after: float
    accepted: int
    proposals: int


def sample_fg_tile_batches(dataset, tiles: int, seed: int = 0,
                           tile: int = 512, n_batches: int = 2):
    """``n_batches`` DISJOINT fg-tile ray batches [(ro, rd, tgt), ...].

    Foreground tiles only (RayDataset.tile_fg) — background-only tiles
    carry no silhouette signal. Batches must be disjoint: the second one
    is the hold-out in the acceptance test.
    """
    rng = np.random.default_rng(seed)
    fg_t, n_t = dataset.tile_fg(tile)
    fg_ids = np.asarray(fg_t)[: int(n_t)]
    if fg_ids.size < n_batches:
        raise ValueError(
            f"dataset has {fg_ids.size} fg tiles < n_batches ({n_batches})")
    # Underfilled pools would leave the hold-out batch short or empty (an
    # empty batch NaNs the acceptance mean → silent no-op, ADVICE r3):
    # divide what is available evenly instead.
    tiles = min(tiles, fg_ids.size // n_batches)
    pick = rng.choice(fg_ids, size=n_batches * tiles, replace=False)
    out = []
    for b in range(n_batches):
        ids = pick[b * tiles:(b + 1) * tiles]
        idx = np.sort((ids[:, None] * tile
                       + np.arange(tile)[None, :]).reshape(-1))
        out.append((jnp.asarray(np.asarray(dataset.rays_o)[idx]),
                    jnp.asarray(np.asarray(dataset.rays_d)[idx]),
                    jnp.asarray(np.asarray(dataset.targets)[idx])))
    return out


def geometry_refine(
    padded: SceneParams,
    mask: jax.Array,
    batches,                       # [(ro, rd, tgt), (ro, rd, tgt)] disjoint
    cfg: TrainConfig,
    *,
    kern=None,                     # fused culled march kernel (TPU) or None
    proposals: int = 768,
    phases: int = 3,
    frac: float = 0.05,
    sigma_c: float = 0.3,          # in units of each primitive's radius
    sigma_r: float = 0.15,         # raw (softplus-domain) radius noise
    select_probs: Optional[jax.Array] = None,   # [M_pad] proposal bias
    key: Optional[jax.Array] = None,
    chunk: Optional[int] = None,   # proposals/program; None = _auto_chunk
    log=print,
) -> tuple[SceneParams, RefineStats]:
    """Hill-climb (centers, radii) on the two-batch-gated loss.

    Colors/light stay fixed (they are first-order-trainable; geometry is
    the stuck group). Each phase halves the noise scale. The caller should
    gate the returned params on a FULL evaluation (Trainer.polish-style
    greedy keep) — with adequate batch sizes the gate passes, but it makes
    the procedure never-regress by construction.

    ``select_probs`` biases WHICH primitives each proposal perturbs:
    per-primitive selection probability ∝ the given weights with the
    expected selected count held at ``frac``·N_live (uniform Bernoulli
    when None). Residual-attribution weights
    (train/residual.primitive_residual_scores) concentrate proposals on
    the primitives actually carrying reconstruction error — the
    silhouette band — instead of spending most draws on settled interior
    geometry.
    """
    (ro_a, rd_a, tgt_a), (ro_b, rd_b, tgt_b) = batches
    rc = cfg.render
    k_budget = min(cfg.cull_budget, REFINE_MAX_BUDGET)
    live = jnp.asarray(mask, jnp.float32)[:, None]
    if select_probs is not None:
        w = jnp.maximum(jnp.asarray(select_probs, jnp.float32), 0.0)
        w = w * live[:, 0]
        n_live = jnp.maximum(jnp.sum(live), 1.0)
        p_sel = jnp.clip(frac * n_live * w
                         / jnp.maximum(jnp.sum(w), 1e-20), 0.0, 1.0)
        p_sel = p_sel[:, None]
    else:
        p_sel = jnp.full((padded.centers.shape[0], 1), frac, jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)

    def loss_on(params, ro, rd, tgt):
        c, col, r, ld, amb = activate(params)
        out = render_diff_culled(
            ro, rd, c, col, r, ld, amb, jnp.float32(cfg.max_smooth_k),
            mask=mask, tile=cfg.cull_tile, k_budget=k_budget,
            softmax_sharpness=rc.softmax_sharpness,
            mask_sharpness=rc.mask_sharpness,
            coverage_mode=rc.coverage_mode,
            mask_pixel_mult=rc.mask_pixel_mult,
            pixel_angle=rc.pixel_angle,
            march_normal_fn=kern)
        w = jnp.where(jnp.sum(tgt, axis=1, keepdims=True)
                      > cfg.loss.fg_mask_threshold,
                      cfg.loss.fg_weight, cfg.loss.bg_weight_end)
        return jnp.mean(jnp.abs(out - tgt) * w)

    csize = int(chunk) if chunk else _auto_chunk(k_budget)

    @jax.jit
    def propose_chunk(params, best_a, best_b, key, sigma_scale):
        r_phys = jax.nn.softplus(params.radii) + 0.01

        def prop(carry, i):
            params, best_a, best_b = carry
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
            sel = (jax.random.uniform(k1, (params.centers.shape[0], 1))
                   < p_sel).astype(jnp.float32) * live
            cand = SceneParams(
                centers=params.centers
                + jax.random.normal(k2, params.centers.shape)
                * sigma_c * sigma_scale * r_phys * sel,
                colors=params.colors,
                radii=params.radii
                + jax.random.normal(k3, params.radii.shape)
                * sigma_r * sigma_scale * sel,
                light_dir=params.light_dir, ambient=params.ambient)
            l_a = loss_on(cand, ro_a, rd_a, tgt_a)
            l_b = loss_on(cand, ro_b, rd_b, tgt_b)
            acc = (l_a < best_a) & (l_b < best_b)
            params = jax.tree.map(lambda a, b: jnp.where(acc, b, a),
                                  params, cand)
            return (params, jnp.where(acc, l_a, best_a),
                    jnp.where(acc, l_b, best_b)), acc

        (params, best_a, best_b), accs = jax.lax.scan(
            prop, (params, best_a, best_b), jnp.arange(csize))
        return params, best_a, best_b, jnp.sum(accs)

    best_a = jax.jit(lambda p: loss_on(p, ro_a, rd_a, tgt_a))(padded)
    best_b = jax.jit(lambda p: loss_on(p, ro_b, rd_b, tgt_b))(padded)
    l0 = float(best_a)
    accepted = 0
    total = 0
    for ph in range(phases):
        scale = jnp.float32(0.5 ** ph)
        ph_acc = 0
        for _ in range(max(proposals // csize, 1)):
            key, sub = jax.random.split(key)
            padded, best_a, best_b, acc = propose_chunk(
                padded, best_a, best_b, sub, scale)
            ph_acc += int(acc)
            total += csize
        accepted += ph_acc
        log(f"  refine phase {ph}: loss {float(best_a):.5f}, "
            f"accepted {ph_acc}/{max(proposals // csize, 1) * csize}")
    return padded, RefineStats(loss_before=l0, loss_after=float(best_a),
                               accepted=accepted, proposals=total)
