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


def ray_sort_keys(origin, direction, lo, hi, octant_major: bool = False):
    """15-bit coherence key per ray: 12-bit Morton of the quantized origin
    (4 bits/axis within [lo, hi]) + 3-bit direction octant.

    octant_major puts the direction octant in the HIGH bits: sorted cells
    then hold rays travelling the same general direction, which is what the
    cluster tiers' per-cell slab culling and nearest-first visit order need
    (clusters behind a whole direction-coherent cell cull; best_t tightens
    front-to-back).  Origin-major keys (default) favour shared-origin
    locality instead — right for shadow fans, wrong for BRDF bounces."""
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
    if octant_major:
        return (octant << 12) | morton
    return (morton << 3) | octant


def ray_sort_keys_dirq(origin, direction, lo, hi):
    """Direction-major key with finer direction resolution: 2 bits/axis of
    the (unnormalized-ok) direction in the HIGH bits, 9-bit origin Morton
    (3 bits/axis) in the LOW bits.  Trades origin locality for tighter
    per-cell direction cones — for BRDF-bounce wavefronts where the cluster
    tiers' culling lives or dies on cone width."""
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((origin - lo) / span * 8.0).astype(jnp.int32), 0, 7)
    morton9 = (
        _spread4(q[..., 0]) | (_spread4(q[..., 1]) << 1)
        | (_spread4(q[..., 2]) << 2)
    )
    qd = jnp.clip(
        ((direction + 1.0) * 2.0).astype(jnp.int32), 0, 3
    )
    dir6 = (qd[..., 0] << 4) | (qd[..., 1] << 2) | qd[..., 2]
    return (dir6 << 9) | morton9


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
