"""Ray stream sorting (Morton binning) for incoherent wavefronts.

The clustered intersectors (accel/pallas_cluster) cull whole [8,128]-ray
tiles per cluster AABB, so their cost is set by how many clusters ANY ray
in a tile touches: pixel-ordered primary rays are coherent (73 ms/1M rays
on a 20k-tri scene, v5e) but bounce/connection wavefronts are not (417
ms/1M).  Sorting rays by a Morton code of their quantized origin plus a
direction octant re-establishes tile coherence for ~28 ms/1M of overhead
(one 2-operand sort, one packed input gather, one position scatter, one
packed output gather — TPU gathers cost the same regardless of row width,
so inputs/outputs must go through ONE packed table each, never per-field).

This is the wavefront analogue of DXR's hardware ray-coherence machinery;
the reference relies on the GPU scheduler for it.

Measured reality (v5e, 20k-tri sphere field, benchmarks/cluster_micro.py):
synthetic fully-random rays gain NOTHING from this sort (409 vs 400 ms/1M
closest) — octant+origin-cell bins are too coarse to build narrow per-tile
frustums out of unstructured rays, and the renderer's own bounce/connection
wavefronts are already pixel-ordered (origin-coherent), so the default
everywhere is coherent=True.  The machinery stays available (coherent=False
on any cluster-tier trace/intersect) for workloads with genuinely permuted
ray streams, e.g. externally batched ray queries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _spread4(x):
    """Spread the low 4 bits of x to every 3rd bit (Morton interleave)."""
    x = x & 0xF
    x = (x | (x << 6)) & 0x0C3   # 0b000011000011
    x = (x | (x << 3)) & 0x249   # 0b001001001001
    return x


def ray_sort_keys(origin, direction, lo, hi):
    """15-bit coherence key per ray: 12-bit Morton of the quantized origin
    (4 bits/axis within [lo, hi]) + 3-bit direction octant."""
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(
        ((origin - lo) / span * 16.0).astype(jnp.int32), 0, 15
    )
    morton = (
        _spread4(q[..., 0])
        | (_spread4(q[..., 1]) << 1)
        | (_spread4(q[..., 2]) << 2)
    )
    octant = (
        (direction[..., 0] >= 0).astype(jnp.int32)
        | ((direction[..., 1] >= 0).astype(jnp.int32) << 1)
        | ((direction[..., 2] >= 0).astype(jnp.int32) << 2)
    )
    return (morton << 3) | octant


def make_permutation(keys_flat):
    """(perm, inv_perm) sorting rays by key; both [N] int32."""
    n = keys_flat.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort([keys_flat, iota], num_keys=1)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    return perm, inv


def scene_bounds(tris):
    """(lo, hi) of the triangle soup, on-device (usable under jit)."""
    v0 = tris.v0
    v1 = tris.v0 + tris.e1
    v2 = tris.v0 + tris.e2
    lo = jnp.minimum(jnp.minimum(v0.min(0), v1.min(0)), v2.min(0))
    hi = jnp.maximum(jnp.maximum(v0.max(0), v1.max(0)), v2.max(0))
    return lo, hi
