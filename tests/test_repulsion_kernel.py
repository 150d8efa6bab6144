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
