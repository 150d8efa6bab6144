"""Coherent-tile culling: geometry, selection, and exactness of the culled
renderer vs the dense one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.data.camera import create_camera_rays
from burn_raymarching_tpu.ops.culling import (
    cone_point_distance,
    select_tile_primitives,
    tile_cones,
)
from burn_raymarching_tpu.render.culled import render_diff_culled
from burn_raymarching_tpu.render.diff import render_diff


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    m = 40
    centers = jnp.asarray(rng.normal(0, 0.4, (m, 3)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0.1, 1.0, (m, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.03, 0.15, (m, 1)), jnp.float32)
    light = jnp.asarray([0.2, 1.0, -0.3], jnp.float32)
    ambient = jnp.asarray([0.2], jnp.float32)
    ro, rd = create_camera_rays(32, 32, [0.0, 0.5, -2.5], [0, 0, 0], 50.0)
    return centers, colors, radii, light, ambient, ro, rd


def test_cones_contain_their_rays(scene):
    _, _, _, _, _, ro, rd = scene
    cones = tile_cones(ro, rd, 128)
    b = ro.shape[0] // 128
    rdt = np.asarray(rd).reshape(b, 128, 3)
    axis = np.asarray(cones.axis)
    cosh = np.asarray(cones.cos_half)
    for i in range(b):
        cos_all = rdt[i] @ axis[i]
        assert (cos_all >= cosh[i] - 1e-6).all()


def test_cone_distance_zero_for_points_on_rays(scene):
    _, _, _, _, _, ro, rd = scene
    cones = tile_cones(ro, rd, 128)
    # Points along the first ray of each tile must be inside its cone.
    b = ro.shape[0] // 128
    rot = np.asarray(ro).reshape(b, 128, 3)[:, 0]
    rdt = np.asarray(rd).reshape(b, 128, 3)[:, 0]
    pts = jnp.asarray(rot + 2.0 * rdt)
    d = np.asarray(cone_point_distance(cones, pts))
    assert (np.diagonal(d) < 1e-5).all()


def test_selection_keeps_all_near_primitives(scene):
    centers, _, radii, _, _, ro, rd = scene
    cones = tile_cones(ro, rd, 128)
    idx, valid = select_tile_primitives(cones, centers, radii,
                                        jnp.float32(32.0), 40)
    # Budget == M: every primitive within the cutoff must be kept; at least
    # the ones the camera actually sees.
    assert bool(valid.any())
    # Indices are valid range.
    assert int(idx.max()) < centers.shape[0]


def test_culled_render_matches_dense(scene):
    centers, colors, radii, light, ambient, ro, rd = scene
    dense = np.asarray(jax.jit(render_diff)(
        ro, rd, centers, colors, radii, light, ambient, jnp.float32(32.0)))
    culled = np.asarray(jax.jit(
        lambda *a: render_diff_culled(*a, tile=128, k_budget=40))(
        ro, rd, centers, colors, radii, light, ambient, jnp.float32(32.0)))
    # Grazing rays amplify reduction-order fp differences through the
    # 40-step march; everything else matches tightly.
    np.testing.assert_allclose(culled, dense, rtol=8e-3, atol=1e-3)


def test_culled_render_matches_dense_with_mask(scene):
    centers, colors, radii, light, ambient, ro, rd = scene
    m = centers.shape[0]
    mask = jnp.arange(m) < (m - 8)
    dense = np.asarray(jax.jit(render_diff)(
        ro, rd, centers, colors, radii, light, ambient, jnp.float32(32.0),
        mask))
    culled = np.asarray(jax.jit(
        lambda *a: render_diff_culled(*a, tile=128, k_budget=40))(
        ro, rd, centers, colors, radii, light, ambient, jnp.float32(32.0),
        mask))
    np.testing.assert_allclose(culled, dense, rtol=2e-3, atol=2e-4)


def test_culled_gradients_match_dense(scene):
    centers, colors, radii, light, ambient, ro, rd = scene

    def loss_dense(c):
        return render_diff(ro, rd, c, colors, radii, light, ambient,
                           jnp.float32(32.0)).sum()

    def loss_culled(c):
        return render_diff_culled(ro, rd, c, colors, radii, light, ambient,
                                  jnp.float32(32.0), tile=128,
                                  k_budget=40).sum()

    g_d = np.asarray(jax.jit(jax.grad(loss_dense))(centers))
    g_c = np.asarray(jax.jit(jax.grad(loss_culled))(centers))
    np.testing.assert_allclose(g_c, g_d, rtol=5e-2, atol=5e-3)


def test_small_budget_keeps_strongest(scene):
    # A tight budget must still produce a finite, plausible image.
    centers, colors, radii, light, ambient, ro, rd = scene
    out = np.asarray(jax.jit(
        lambda *a: render_diff_culled(*a, tile=128, k_budget=8))(
        ro, rd, centers, colors, radii, light, ambient, jnp.float32(32.0)))
    assert np.isfinite(out).all()
