"""Gamma-corrected PNG I/O.

Matches the reference's exact transfer functions (src/util.rs:4-33):
save encodes linear → sRGB-ish with x^(1/2.2), clamps, scales by 255 and
truncates to u8 (Rust `as u8` truncates toward zero — so do numpy uint8
casts); load decodes with (x/255)^2.2. Images are [H*W, 3] linear float32.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def save_array_as_image(arr, width: int, height: int, path: str) -> None:
    """Save a [H*W, 3] (or [H, W, 3]) linear float array as a gamma-2.2 PNG.

    Reference: src/util.rs:4-18.
    """
    a = np.asarray(arr, dtype=np.float32).reshape(height, width, 3)
    # Negative inputs produce NaN under fractional pow in the reference and
    # then cast to 0 (`as u8` on NaN is 0 in Rust); clipping first is
    # equivalent and NaN-free.
    a = np.clip(a, 0.0, 1.0)
    pixels = (a ** (1.0 / 2.2) * 255.0).astype(np.uint8)
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    Image.fromarray(pixels, mode="RGB").save(path)


def load_image_as_array(path: str) -> np.ndarray:
    """Load a PNG → [H*W, 3] linear float32 via gamma-2.2 decode.

    Reference: src/util.rs:21-33.
    """
    img = Image.open(path).convert("RGB")
    pixels = np.asarray(img, dtype=np.float32) / 255.0
    linear = pixels ** 2.2
    return linear.reshape(-1, 3)


def image_size(path: str) -> tuple[int, int]:
    """(width, height) of an image file."""
    with Image.open(path) as img:
        return img.size
