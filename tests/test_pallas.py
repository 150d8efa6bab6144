"""Pallas fused march kernel vs the XLA reference path (interpreter mode on
CPU; the real-TPU path is exercised by bench.py and the TPU smoke test)."""

import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.data.camera import create_camera_rays
from burn_raymarching_tpu.ops.march import march_xla
from burn_raymarching_tpu.ops.pallas.march_kernel import march_pallas


@pytest.fixture(scope="module")
def scene():
    centers = jnp.asarray(
        [[-0.3, 0.0, 0.0], [0.0, 0.0, 0.0], [0.3, 0.0, 0.0]], jnp.float32
    )
    radii = jnp.asarray([[0.2], [0.15], [0.2]], jnp.float32)
    ro, rd = create_camera_rays(16, 8, [0.0, 0.5, -2.5], [0.0, 0.0, 0.0], 50.0)
    return ro, rd, centers, radii


def test_march_pallas_matches_xla(scene):
    ro, rd, centers, radii = scene
    t_ref = np.asarray(march_xla(ro, rd, centers, radii, 32.0))
    t_pl = np.asarray(march_pallas(ro, rd, centers, radii, 32.0,
                                   interpret=True, tile_n=64))
    np.testing.assert_allclose(t_pl, t_ref, rtol=1e-5, atol=1e-5)


def test_march_pallas_masked(scene):
    ro, rd, centers, radii = scene
    # Pad with junk primitives that the mask must exclude.
    c_pad = jnp.concatenate([centers, jnp.ones((2, 3)) * 0.1])
    r_pad = jnp.concatenate([radii, jnp.ones((2, 1)) * 0.5])
    mask = jnp.arange(5) < 3
    t_ref = np.asarray(march_xla(ro, rd, centers, radii, 32.0))
    t_pl = np.asarray(march_pallas(ro, rd, c_pad, r_pad, 32.0, mask=mask,
                                   interpret=True, tile_n=64))
    np.testing.assert_allclose(t_pl, t_ref, rtol=1e-5, atol=1e-5)


def test_march_pallas_ragged_n(scene):
    # N not a multiple of the tile: wrapper pads and slices back.
    ro, rd, centers, radii = scene
    ro_r, rd_r = ro[:100], rd[:100]
    t_ref = np.asarray(march_xla(ro_r, rd_r, centers, radii, 32.0))
    t_pl = np.asarray(march_pallas(ro_r, rd_r, centers, radii, 32.0,
                                   interpret=True, tile_n=64))
    assert t_pl.shape == (100, 1)
    np.testing.assert_allclose(t_pl, t_ref, rtol=1e-5, atol=1e-5)


def test_march_pallas_annealed_k(scene):
    ro, rd, centers, radii = scene
    for k in (5.0, 18.5, 32.0):
        t_ref = np.asarray(march_xla(ro, rd, centers, radii, k))
        t_pl = np.asarray(march_pallas(ro, rd, centers, radii, k,
                                       interpret=True, tile_n=64))
        np.testing.assert_allclose(t_pl, t_ref, rtol=1e-5, atol=1e-5)
