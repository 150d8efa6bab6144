"""Fused dense march+normals kernel vs the XLA reference path (interpreter
mode on CPU; the real-TPU path is exercised by bench.py and the TPU smoke
test). The standalone march-only kernel was folded into march_shade_pallas
(one dense kernel, VERDICT r1 weak #6) — these tests pin the survivor's
march output against march_xla and its normals against the XLA 6-tap."""

import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.data.camera import create_camera_rays
from burn_raymarching_tpu.ops.march import march_xla
from burn_raymarching_tpu.ops.pallas.march_shade_kernel import (
    march_shade_pallas,
)
from burn_raymarching_tpu.ops.sdf import scene_normal


@pytest.fixture(scope="module")
def scene():
    centers = jnp.asarray(
        [[-0.3, 0.0, 0.0], [0.0, 0.0, 0.0], [0.3, 0.0, 0.0]], jnp.float32
    )
    radii = jnp.asarray([[0.2], [0.15], [0.2]], jnp.float32)
    ro, rd = create_camera_rays(16, 8, [0.0, 0.5, -2.5], [0.0, 0.0, 0.0], 50.0)
    return ro, rd, centers, radii


def _kernel(*args, **kw):
    return march_shade_pallas(*args, interpret=True, tile_n=64, **kw)


def test_march_matches_xla(scene):
    ro, rd, centers, radii = scene
    t_ref = np.asarray(march_xla(ro, rd, centers, radii, 32.0))
    t_pl, _ = _kernel(ro, rd, centers, radii, 32.0)
    np.testing.assert_allclose(np.asarray(t_pl), t_ref, rtol=1e-5, atol=1e-5)


def test_march_masked(scene):
    ro, rd, centers, radii = scene
    # Pad with junk primitives that the mask must exclude.
    c_pad = jnp.concatenate([centers, jnp.ones((2, 3)) * 0.1])
    r_pad = jnp.concatenate([radii, jnp.ones((2, 1)) * 0.5])
    mask = jnp.arange(5) < 3
    t_ref = np.asarray(march_xla(ro, rd, centers, radii, 32.0))
    t_pl, _ = _kernel(ro, rd, c_pad, r_pad, 32.0, mask=mask)
    np.testing.assert_allclose(np.asarray(t_pl), t_ref, rtol=1e-5, atol=1e-5)


def test_march_ragged_n(scene):
    # N not a multiple of the tile: wrapper pads and slices back.
    ro, rd, centers, radii = scene
    ro_r, rd_r = ro[:100], rd[:100]
    t_ref = np.asarray(march_xla(ro_r, rd_r, centers, radii, 32.0))
    t_pl, _ = _kernel(ro_r, rd_r, centers, radii, 32.0)
    assert t_pl.shape == (100, 1)
    np.testing.assert_allclose(np.asarray(t_pl), t_ref, rtol=1e-5, atol=1e-5)


def test_march_annealed_k(scene):
    ro, rd, centers, radii = scene
    for k in (5.0, 18.5, 32.0):
        t_ref = np.asarray(march_xla(ro, rd, centers, radii, k))
        t_pl, _ = _kernel(ro, rd, centers, radii, k)
        np.testing.assert_allclose(np.asarray(t_pl), t_ref, rtol=1e-5,
                                   atol=1e-5)


def test_normals_match_xla_six_tap(scene):
    """The kernel's fused normal taps == the XLA 6-tap central differences
    at the kernel's own reattached point (incl. the +1e-6-inside-
    normalization reference quirk, scene.rs:81-128)."""
    _, _, centers, radii = scene
    # Denser rays zoomed on the spheres so plenty of rays actually hit.
    ro, rd = create_camera_rays(24, 24, [0.0, 0.3, -1.2], [0.0, 0.0, 0.0],
                                50.0)
    t_pl, n_pl = _kernel(ro, rd, centers, radii, 32.0)
    t = jnp.asarray(t_pl)
    from burn_raymarching_tpu.ops.sdf import scene_sdf

    p = ro + rd * t
    p_final = ro + rd * (t + scene_sdf(p, centers, radii, 32.0))
    n_ref = np.asarray(scene_normal(p_final, centers, radii, 32.0))
    # Far-missed rays (t → T_MAX) normalize ~zero finite differences into
    # noise; the renderer multiplies them by ~0 coverage. Compare the rays
    # that matter.
    near = np.asarray(t)[:, 0] < 10.0
    assert near.sum() > 100
    # ~0.19-magnitude normals (the +1e-6 quirk); kernel taps reassociate
    # fp vs the XLA [6N, M] batch — worst observed delta 9e-5.
    np.testing.assert_allclose(np.asarray(n_pl)[near], n_ref[near],
                               atol=2e-4)
