"""PSNR evaluation utilities."""

import numpy as np

from burn_raymarching_tpu.train.evaluate import encode_u8, psnr_u8


def test_psnr_identical_is_inf():
    a = np.random.default_rng(0).integers(0, 255, (64, 3)).astype(np.uint8)
    assert psnr_u8(a, a) == float("inf")


def test_psnr_known_value():
    a = np.zeros((100, 3), np.uint8)
    b = np.full((100, 3), 10, np.uint8)   # MSE = 100
    np.testing.assert_allclose(psnr_u8(a, b),
                               20 * np.log10(255) - 10 * np.log10(100),
                               rtol=1e-9)


def test_encode_matches_save_pipeline():
    x = np.array([[0.0, 0.5, 1.0], [-0.2, 2.0, 0.25]], np.float32)
    got = encode_u8(x)
    want = (np.clip(x, 0, 1) ** (1 / 2.2) * 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    assert got[1, 0] == 0 and got[1, 1] == 255
