"""Fused cluster-repulsion kernel (custom VJP) vs the XLA version
(interpreter mode on CPU; TPU timings in docs/PARITY.md)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.ops.culling import build_clusters
from burn_raymarching_tpu.ops.pallas.repulsion_kernel import (
    cluster_repulsion_fused,
)
from burn_raymarching_tpu.train.loss import cluster_repulsion

fused = functools.partial(cluster_repulsion_fused, interpret=True)


def make_cloud(m, seed=0, group=8):
    rng = np.random.default_rng(seed)
    centers = jnp.asarray(rng.uniform(-0.8, 0.8, (m, 3)), jnp.float32)
    mask = jnp.asarray(rng.random(m) > 0.1)
    cl = build_clusters(np.asarray(centers), mask=np.asarray(mask),
                        group=group)
    n_valid = jnp.sum(mask.astype(jnp.float32))
    return centers, mask, cl, n_valid


@pytest.mark.parametrize("m,group", [(64, 8), (200, 8), (96, 4)])
def test_value_matches_xla(m, group):
    centers, mask, cl, n_valid = make_cloud(m, seed=m, group=group)
    ref = float(cluster_repulsion(centers, cl, mask, n_valid))
    got = float(fused(centers, cl, mask, n_valid))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_gradient_matches_xla():
    """Full-chain gradient (member gather + centroids + near/far fields)."""
    centers, mask, cl, n_valid = make_cloud(128, seed=3)

    g_ref = jax.grad(
        lambda c: cluster_repulsion(c, cl, mask, n_valid))(centers)
    g_pl = jax.grad(lambda c: fused(c, cl, mask, n_valid))(centers)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5 * float(
                                   jnp.max(jnp.abs(g_ref))))


def test_gradient_finite_differences():
    """Directional finite-difference check of the custom VJP itself."""
    centers, mask, cl, n_valid = make_cloud(64, seed=5)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=centers.shape), jnp.float32)
    v = v / jnp.sqrt(jnp.sum(v * v))

    def f(c64):
        return fused(c64.astype(jnp.float32), cl, mask, n_valid)

    g = jax.grad(lambda c: f(c))(centers)
    slope = float(jnp.sum(g * v))
    # eps 1e-2: at smaller steps the f32 rounding noise of the summed
    # 1/d terms dominates the difference — the XLA version shows the
    # identical FD deviation (3.9% at 1e-3, 0.15% at 1e-2).
    eps = 1e-2
    fd = (float(f(centers + eps * v)) - float(f(centers - eps * v))) / (
        2 * eps)
    np.testing.assert_allclose(slope, fd, rtol=1e-2, atol=1e-4)


def test_no_mask_and_ragged_c():
    """No mask; C not a multiple of the cluster block (padding path)."""
    rng = np.random.default_rng(11)
    m = 72  # 9 clusters of 8 -> pads to the block size
    centers = jnp.asarray(rng.uniform(-0.5, 0.5, (m, 3)), jnp.float32)
    cl = build_clusters(np.asarray(centers), group=8)
    n_valid = jnp.asarray(float(m))
    ref = float(cluster_repulsion(centers, cl, None, n_valid))
    got = float(fused(centers, cl, None, n_valid, block_c=4))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("m,group", [(64, 8), (200, 8)])
def test_monopole_value_matches_xla(m, group):
    """far_field="monopole": fused (near kernel + XLA [C,C] monopoles)
    equals the XLA monopole path, value and gradient."""
    centers, mask, cl, n_valid = make_cloud(m, seed=m + 1, group=group)
    ref, g_ref = jax.value_and_grad(
        lambda c: cluster_repulsion(c, cl, mask, n_valid,
                                    far_field="monopole"))(centers)
    got, g_pl = jax.value_and_grad(
        lambda c: fused(c, cl, mask, n_valid,
                        far_field="monopole"))(centers)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5 * float(
                                   jnp.max(jnp.abs(g_ref))))


def test_monopole_approximates_member():
    """The monopole far field is a coarser approximation of the same sum:
    values within ~2% and gradients strongly aligned with member mode."""
    centers, mask, cl, n_valid = make_cloud(256, seed=42, group=8)
    v_mem, g_mem = jax.value_and_grad(
        lambda c: cluster_repulsion(c, cl, mask, n_valid))(centers)
    v_mono, g_mono = jax.value_and_grad(
        lambda c: cluster_repulsion(c, cl, mask, n_valid,
                                    far_field="monopole"))(centers)
    np.testing.assert_allclose(float(v_mono), float(v_mem), rtol=2e-2)
    a = np.asarray(g_mem).ravel()
    b = np.asarray(g_mono).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.95, cos


def test_compute_loss_routes_fused():
    """compute_loss(repulsion_fn=...) equals the XLA route end-to-end."""
    from burn_raymarching_tpu.models.scene import init_scene_params, pad_params
    from burn_raymarching_tpu.train.loss import compute_loss

    centers, mask, cl, n_valid = make_cloud(64, seed=9)
    params = init_scene_params(64)
    params.centers = centers
    padded, pmask = pad_params(params, 64)
    pmask = pmask & mask
    out = jnp.abs(jnp.sin(jnp.arange(256 * 3, dtype=jnp.float32))
                  ).reshape(256, 3)
    tgt = jnp.roll(out, 1, axis=0)

    def loss(p, fn):
        return compute_loss(p, out, tgt, jnp.float32(0.5), mask=pmask,
                            repulsion_clusters=cl, repulsion_fn=fn)

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, None))(padded)
    l_pl, g_pl = jax.value_and_grad(lambda p: loss(p, fused))(padded)
    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl.centers),
                               np.asarray(g_ref.centers),
                               rtol=1e-4, atol=1e-8)


# --------------------------------------------------------------------- #
# Chunk-frozen static prep (train/loss.RepulsionStatic, round 5)
# --------------------------------------------------------------------- #

def test_static_prep_matches_live_prep_exactly():
    """With tables built from the SAME centers, the static path must
    reproduce the on-the-fly path bit-for-bit (value and gradient) on
    both the XLA and the fused route, both far-field modes."""
    from burn_raymarching_tpu.train.loss import build_repulsion_static

    centers, mask, cl, n_valid = make_cloud(200, seed=7)
    static = build_repulsion_static(centers, cl, mask)
    for ff in ("member", "monopole"):
        v0, g0 = jax.value_and_grad(
            lambda c: cluster_repulsion(c, cl, mask, n_valid,
                                        far_field=ff))(centers)
        v1, g1 = jax.value_and_grad(
            lambda c: cluster_repulsion(c, cl, mask, n_valid,
                                        far_field=ff,
                                        static=static))(centers)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-5, atol=1e-7 * float(
                                       jnp.max(jnp.abs(g0))))
        v2, g2 = jax.value_and_grad(
            lambda c: fused(c, cl, mask, n_valid, far_field=ff,
                            static=static))(centers)
        np.testing.assert_allclose(float(v2), float(v0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g0),
                                   rtol=1e-4, atol=1e-5 * float(
                                       jnp.max(jnp.abs(g0))))


def test_static_prep_carries_no_center_gradient():
    """The frozen tables are non-differentiable by construction: moving
    the centers the tables were built from must not change the gradient
    path (tables are constants under AD)."""
    from burn_raymarching_tpu.train.loss import build_repulsion_static

    centers, mask, cl, n_valid = make_cloud(96, seed=13)
    static = build_repulsion_static(centers, cl, mask)
    moved = centers + 0.01  # stale tables, live geometry

    def f(c):
        return cluster_repulsion(c, cl, mask, n_valid, static=static)

    v, g = jax.value_and_grad(f)(moved)
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()
    # Stale near-set is an approximation-order change only: the value
    # stays within a few percent of the fresh-prep evaluation.
    v_fresh = float(cluster_repulsion(moved, cl, mask, n_valid))
    np.testing.assert_allclose(float(v), v_fresh, rtol=5e-2)


def test_trainer_chunk_uses_static_tables():
    """End-to-end: a culled cluster_repulsion training chunk runs (and
    descends) with the per-chunk static tables wired through run_chunk."""
    import dataclasses
    import os

    from burn_raymarching_tpu.config import TrainConfig
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    cfg = TrainConfig(
        batch_size=1024, stages=1, steps_per_stage=10, steps_per_call=10,
        use_pallas=False, checkpoint_dir=None,
        use_culling=True, cull_budget=16, cull_tile=256,
        dataset_order="morton", cluster_repulsion=True,
        cull_cluster_group=4, init_n=12,
        cameras_json="/root/reference/data/cameras.json",
    )
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        ds = build_dataset(cfg)
    finally:
        os.chdir(cwd)
    tr = Trainer(dataclasses.replace(cfg), ds, log=lambda s: None)
    tr._io = False
    padded, mask = tr.run()
    for leaf in jax.tree.leaves(padded):
        assert np.isfinite(np.asarray(leaf)).all()
