"""Image IO + quality metrics (PNG write, PSNR) — the test-harness analogue
of Falcor's screenshot capture + ImageMagick compare (RunTestsSet.py:262-289).
"""
from __future__ import annotations

import numpy as np


def to_u8(img) -> np.ndarray:
    arr = np.asarray(img)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img) -> None:
    from PIL import Image

    Image.fromarray(to_u8(img)).save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def mse(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape[-1] == 4:
        a = a[..., :3]
    if b.shape[-1] == 4:
        b = b[..., :3]
    return float(np.mean((a - b) ** 2))


def psnr(a, b, peak: float = 1.0) -> float:
    m = mse(a, b)
    if m <= 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / m))
