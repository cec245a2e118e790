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


def read_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) reader -> [h, w, 4] float32 (a=1).

    Handles the 32-bit_rle_rgbe format: new-style RLE scanlines (0x02 0x02
    length marker, per-component runs) and flat scanlines.  Decode follows
    Radiance's ldexp((c + 0.5) / 256, e - 128).
    """
    with open(path, "rb") as fh:
        if not fh.readline().startswith(b"#?"):
            raise ValueError(f"{path}: not a Radiance file")
        while True:
            line = fh.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = fh.readline().split()
        if len(dims) != 4 or dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"{path}: unsupported resolution line {dims}")
        h, w = int(dims[1]), int(dims[3])
        data = fh.read()

    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2 \
                and (data[pos + 2] << 8 | data[pos + 3]) == w:
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x:x + count, c] = np.frombuffer(
                            data, np.uint8, count, pos)
                        pos += count
                        x += count
        else:  # flat scanline
            row = np.frombuffer(data, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4

    mant = rgbe[..., :3].astype(np.float32) + 0.5
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e == 0, 0.0, np.ldexp(1.0 / 256.0, e - 128)).astype(np.float32)
    rgb = mant * scale[..., None]
    rgb[rgbe[..., 3] == 0] = 0.0
    return np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)


def write_hdr(path: str, img) -> None:
    """Minimal Radiance RGBE writer (flat scanlines) for fixtures/tests."""
    rgb = np.asarray(img, np.float32)[..., :3]
    h, w = rgb.shape[:2]
    m = rgb.max(-1)
    e = np.zeros((h, w), np.int32)
    nz = m > 1e-32
    e[nz] = np.frexp(m[nz])[1]
    scale = np.zeros((h, w), np.float32)
    scale[nz] = np.ldexp(256.0, -e[nz])
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(f"-Y {h} +X {w}\n".encode())
        fh.write(rgbe.tobytes())


def read_image(path: str) -> np.ndarray:
    """Any image -> [h, w, 4] float32 rgba: .hdr via the RGBE reader
    (linear radiance), everything else via PIL as [0,1] sRGB-as-stored
    (the reference samples its PNG/JPG probes without conversion,
    lightProbeGBuffer.rt.hlsl:64-75)."""
    if path.lower().endswith(".hdr"):
        return read_hdr(path)
    rgb = read_png(path)
    return np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)
