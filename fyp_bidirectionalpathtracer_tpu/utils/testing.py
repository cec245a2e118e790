"""Golden-image regression harness.

The reference tests rendering via screenshot capture + ImageMagick compare
with tolerance (SampleTest + RunTestsSet.py:262-289, tolerance 0.01).  Here:
render a small deterministic config, compare PSNR against a checked-in
golden PNG.  Determinism comes from fixed frame-count-derived RNG seeding
(pixel_seeds) exactly as the reference gets it from gFrameCount.
"""
from __future__ import annotations

import os

import numpy as np

from .image import psnr, read_png, to_u8, write_png

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "tests", "golden")


def golden_compare(name: str, img, min_psnr: float = 38.0, update_env: str = "UPDATE_GOLDEN"):
    """Compare `img` (float [H,W,3or4]) against tests/golden/<name>.png.

    Returns the PSNR.  Set UPDATE_GOLDEN=1 to (re)write goldens.
    Comparison happens in 8-bit space (like the reference's PNG screenshot
    compare), so tiny float drift across JAX versions is tolerated.
    """
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    arr = np.asarray(img)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    arr = np.clip(arr, 0.0, 1.0)
    if os.environ.get(update_env) or not os.path.exists(path):
        write_png(path, arr)
        return float("inf")
    golden = read_png(path)
    got = to_u8(arr).astype(np.float32) / 255.0
    value = psnr(got, golden)
    if value < min_psnr:
        raise AssertionError(
            f"golden mismatch for {name}: PSNR {value:.2f} dB < {min_psnr} dB "
            f"(set UPDATE_GOLDEN=1 to refresh)"
        )
    return value
