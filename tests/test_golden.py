"""Golden-image tests: our GT renderer must reproduce the reference's
committed data/target_*.png through the same camera + gamma pipeline.

The reference generated those PNGs with src/bin/generate.rs (3 spheres,
10 cameras) on a WGPU GPU in f32; we tolerate a couple of 8-bit LSBs of
float-accumulation difference but require near-exact agreement.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from burn_raymarching_tpu.data.camera import create_camera_rays
from burn_raymarching_tpu.data.image_io import load_image_as_array, save_array_as_image
from burn_raymarching_tpu.render.gt import render_gt

# Dataset-generator ground truth (reference src/bin/generate.rs:29-40).
GT_CENTERS = jnp.asarray([[-0.3, 0.0, 0.0], [0.0, 0.0, 0.0], [0.3, 0.0, 0.0]],
                         dtype=jnp.float32)
GT_COLORS = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                        dtype=jnp.float32)
GT_RADII = jnp.asarray([[0.2], [0.15], [0.2]], dtype=jnp.float32)


_render_gt_jit = jax.jit(render_gt)


def _render_view(cam, width=256, height=256):
    ro, rd = create_camera_rays(width, height, cam["origin"], cam["target"],
                                cam["fov"])
    return np.asarray(_render_gt_jit(ro, rd, GT_CENTERS, GT_COLORS, GT_RADII))


def _encode_u8(img):
    return (np.clip(img, 0, 1) ** (1 / 2.2) * 255.0).astype(np.uint8)


@pytest.fixture(scope="module")
def cameras(reference_dir):
    with open(os.path.join(reference_dir, "data/cameras.json")) as f:
        return json.load(f)


def test_all_golden_views_match(reference_dir, cameras):
    worst_mean = 0.0
    for cam in cameras:
        ref_png = np.asarray(
            Image.open(os.path.join(reference_dir, cam["file"])).convert("RGB")
        ).astype(np.int32)
        ours = _encode_u8(_render_view(cam)).reshape(256, 256, 3).astype(np.int32)
        diff = np.abs(ours - ref_png)
        mean = diff.mean()
        worst_mean = max(worst_mean, mean)
        # Allow isolated few-LSB disagreement at silhouette edges from f32
        # accumulation-order differences, but the images must agree closely.
        assert mean < 0.5, f"{cam['file']}: mean u8 diff {mean}"
        assert (diff > 8).mean() < 0.002, f"{cam['file']}: too many large diffs"
    print("worst per-view mean u8 diff:", worst_mean)


def test_gamma_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(16 * 16, 3)).astype(np.float32)
    path = str(tmp_path / "rt.png")
    save_array_as_image(img, 16, 16, path)
    back = load_image_as_array(path)
    assert back.shape == (256, 3)
    # u8 quantization in gamma space → bounded linear error.
    assert np.abs(back - img).max() < 0.02


def test_save_clamps_and_truncates(tmp_path):
    img = np.array([[-0.5, 0.0, 2.0]], np.float32).repeat(4, 0)
    path = str(tmp_path / "cl.png")
    save_array_as_image(img, 2, 2, path)
    px = np.asarray(Image.open(path))
    assert px.reshape(-1, 3)[0].tolist() == [0, 0, 255]
