"""Per-lane counter RNG, bit-compatible with the reference's shader RNG.

The reference seeds each pixel with a 16-round Tiny-Encryption-Algorithm hash
of (pixelIndex, frameCount) and then draws floats from the Numerical-Recipes
LCG (BDPTUtils.hlsli:91-110).  We reproduce the exact integer sequence,
vectorized over a whole ray batch: the "seed" is a uint32 array with one lane
per ray, and every draw advances each lane independently.  This gives
bit-comparable Monte-Carlo sample sequences against the reference while
staying fully data-parallel (no cross-lane interaction).

A counter-based alternative (jax.random / threefry) is exposed for users who
prefer statistically stronger streams; the renderer takes either through the
same (seed -> (seed, u)) interface.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def tea_init(val0, val1, backoff: int = 16):
    """16-round TEA hash of two uint32s -> per-lane seed.

    Matches initRand (BDPTUtils.hlsli:91-103).  `backoff` is a static Python
    int so the round loop unrolls at trace time.
    """
    v0 = jnp.asarray(val0).astype(_U32)
    v1 = jnp.asarray(val1).astype(_U32)
    v0, v1 = jnp.broadcast_arrays(v0, v1)
    s0 = jnp.zeros_like(v0)
    for _ in range(backoff):
        s0 = s0 + _U32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + _U32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + _U32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + _U32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + _U32(0x7E95761E))
        )
    return v0


def pixel_seeds(width: int, height: int, frame: int | jnp.ndarray, backoff: int = 16,
                row0=0, sub_height: int | None = None):
    """Seed array [H, W] the way the reference seeds each pixel:
    initRand(x + y*W, frameCount, 16) (BDPTMain.rt.hlsl:73).

    row0/sub_height produce rows [row0, row0+sub_height) of the full-image
    seed grid (global pixel ids) for the row-sharded shard_map path."""
    sub_h = height if sub_height is None else sub_height
    xs = jnp.arange(width, dtype=_U32)[None, :]
    ys = (jnp.arange(sub_h, dtype=_U32)
          + jnp.asarray(row0).astype(_U32))[:, None]
    lin = ys * _U32(width) + xs
    frame = jnp.asarray(frame).astype(_U32)
    return tea_init(lin, jnp.broadcast_to(frame, lin.shape), backoff)


def next_rand(seed):
    """Advance the LCG, return (new_seed, uniform float32 in [0, 1)).

    Matches nextRand (BDPTUtils.hlsli:106-110): s = 1664525*s + 1013904223,
    value = (s & 0xFFFFFF) / 0x1000000.
    """
    seed = seed * _U32(1664525) + _U32(1013904223)
    u = (seed & _U32(0x00FFFFFF)).astype(jnp.float32) * jnp.float32(1.0 / 0x01000000)
    return seed, u


def next_rand2(seed):
    """Two consecutive draws (common: 2D sample)."""
    seed, u0 = next_rand(seed)
    seed, u1 = next_rand(seed)
    return seed, u0, u1


def next_rand3(seed):
    seed, u0 = next_rand(seed)
    seed, u1 = next_rand(seed)
    seed, u2 = next_rand(seed)
    return seed, u0, u1, u2
