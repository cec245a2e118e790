"""Pallas TPU kernels for dense ray-triangle intersection.

The jnp brute-force path (accel.traverse.intersect_brute) makes XLA
materialize [rays, tris, 3] intermediates in HBM; these kernels instead tile
the computation as [RAY_BLOCK, TRI_TILE] blocks entirely in VMEM.

Intersection uses the Baldwin-Weber precomputed-transform form rather than
Möller-Trumbore: per triangle we pre-bake the plane (n, n·v0) and the two
barycentric rows (r1, r1·v0, r2, r2·v0) of the inverse edge matrix, so each
(ray, tri) pair needs six 3-element dot products — which lower to [B,3]x[3,T]
matmuls on the otherwise-idle MXU — plus ~a dozen VPU ops (t from the plane,
u/v by affine evaluation, validity compares).  Möller-Trumbore costs ~55 VPU
ops per pair and is VMEM-bandwidth bound on the materialized [B,T] temps;
this form cuts that traffic ~3x.

Culling: det_MT = -n·dir, so backface culling keeps n·dir < -eps.

HBM traffic is rays-in + hits-out (~40 B/ray) — the speed-of-light form of
`DispatchRays` for scenes whose triangles fit in VMEM (the Cornell-class
benchmark scenes).  Larger scenes take the BVH path (accel.traverse).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vecmath import cross, dot
from .traverse import HitRecord, TriSoA

RAY_BLOCK = 512
TRI_TILE = 128
_BIG = 1e30  # python float: jnp scalars become captured consts in pallas kernels

# Baldwin-Weber pack rows
BW_ROWS = 16  # 12 used, padded to the sublane multiple


def pack_triangles(tris: TriSoA):
    """[BW_ROWS, T_pad] Baldwin-Weber triangle pack:
    rows 0:3 n, 3 n.v0, 4:7 r1, 7 r1.v0, 8:11 r2, 11 r2.v0."""
    n = cross(tris.e1, tris.e2)
    n_sq = dot(n, n)
    inv = jnp.where(n_sq > 0, 1.0 / jnp.maximum(n_sq, 1e-30), 0.0)
    r1 = cross(tris.e2, n) * inv[:, None]
    r2 = cross(n, tris.e1) * inv[:, None]
    rows = jnp.concatenate(
        [
            n.T,
            dot(n, tris.v0)[None, :],
            r1.T,
            dot(r1, tris.v0)[None, :],
            r2.T,
            dot(r2, tris.v0)[None, :],
        ],
        axis=0,
    )  # [12, T]
    t = tris.v0.shape[0]
    t_pad = max(TRI_TILE, ((t + TRI_TILE - 1) // TRI_TILE) * TRI_TILE)
    return jnp.pad(rows, ((0, BW_ROWS - rows.shape[0]), (0, t_pad - t)))


def bw_intersect_chunk(o3, d3, tri_ref, sl, tmin, tmax, cull_backface: bool,
                       row_base: int = 0):
    """Shared per-chunk Baldwin-Weber test.

    o3, d3: [B, 3] ray blocks; tri_ref rows [row_base:row_base+12] hold the
    BW pack; sl = lane slice of the chunk.  Returns (valid, t, u, v) tiles
    [B, TRI_TILE].
    """
    # HIGHEST precision: default MXU matmuls round f32 inputs to bf16, which
    # visibly corrupts intersection geometry (hit positions off by ~1e-3).
    mm = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    nmat = tri_ref[row_base + 0:row_base + 3, sl]      # [3, T]
    nv0 = tri_ref[row_base + 3:row_base + 4, sl]       # [1, T]
    r1mat = tri_ref[row_base + 4:row_base + 7, sl]
    r1v0 = tri_ref[row_base + 7:row_base + 8, sl]
    r2mat = tri_ref[row_base + 8:row_base + 11, sl]
    r2v0 = tri_ref[row_base + 11:row_base + 12, sl]

    ndir = mm(d3, nmat)          # [B, T] on the MXU
    no = mm(o3, nmat)
    r1d = mm(d3, r1mat)
    r1o = mm(o3, r1mat)
    r2d = mm(d3, r2mat)
    r2o = mm(o3, r2mat)

    if cull_backface:
        dir_ok = ndir < -1e-9
    else:
        dir_ok = jnp.abs(ndir) > 1e-9
    inv_ndir = 1.0 / jnp.where(dir_ok, ndir, 1.0)
    t = (nv0 - no) * inv_ndir
    u = (r1o - r1v0) + t * r1d
    v = (r2o - r2v0) + t * r2d
    valid = (
        dir_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    return valid, t, u, v


def _kernel(o_ref, d_ref, tmin_ref, tmax_ref, tri_ref, t_ref, tri_id_ref,
            u_ref, v_ref, *, n_tri_tiles: int, n_tris: int, cull_backface: bool):
    o3 = o_ref[:, 0:3]
    d3 = d_ref[:, 0:3]
    tmin = tmin_ref[:, 0:1]

    best_t = tmax_ref[:, 0:1] * jnp.ones((RAY_BLOCK, 1), jnp.float32)
    best_id = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TRI_TILE), 1)
    lane_f = lane.astype(jnp.float32)

    for c in range(n_tri_tiles):
        sl = slice(c * TRI_TILE, (c + 1) * TRI_TILE)
        valid, t, u, v = bw_intersect_chunk(
            o3, d3, tri_ref, sl, tmin, best_t, cull_backface
        )
        tri_ids = lane + c * TRI_TILE
        valid = valid & (tri_ids < n_tris)
        t_m = jnp.where(valid, t, _BIG)
        row_min = jnp.min(t_m, axis=1, keepdims=True)
        improved = row_min < best_t
        # first lane achieving the min (float min-reduce; Mosaic lacks bool argmax)
        is_min = (t_m == row_min) & valid
        first = jnp.min(jnp.where(is_min, lane_f, 1e9), axis=1, keepdims=True)
        pick = (lane_f == first) & is_min
        new_id = jnp.sum(jnp.where(pick, tri_ids, 0), axis=1, keepdims=True)
        best_id = jnp.where(improved, new_id, best_id)
        best_t = jnp.where(improved, row_min, best_t)

    # recompute u/v for the winner from its BW constants (one-hot MXU fetch)
    fetched = jnp.zeros((RAY_BLOCK, 12), jnp.float32)
    for c in range(n_tri_tiles):
        sl = slice(c * TRI_TILE, (c + 1) * TRI_TILE)
        local = best_id - c * TRI_TILE
        pick = ((lane == local) & (local >= 0) & (local < TRI_TILE)).astype(jnp.float32)
        fetched = fetched + jax.lax.dot_general(
            pick, tri_ref[0:12, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    dot_rows = lambda r, a: (  # noqa: E731
        r[:, 0:1] * a[:, 0:1] + r[:, 1:2] * a[:, 1:2] + r[:, 2:3] * a[:, 2:3]
    )
    r1_ = fetched[:, 4:7]
    r2_ = fetched[:, 8:11]
    hit_mask = (best_id >= 0).astype(jnp.float32)
    best_u = ((dot_rows(r1_, o3) - fetched[:, 7:8]) + best_t * dot_rows(r1_, d3)) * hit_mask
    best_v = ((dot_rows(r2_, o3) - fetched[:, 11:12]) + best_t * dot_rows(r2_, d3)) * hit_mask

    t_ref[:, :] = best_t
    tri_id_ref[:, :] = best_id
    u_ref[:, :] = best_u
    v_ref[:, :] = best_v


@functools.partial(
    jax.jit, static_argnames=("cull_backface", "interpret", "n_tris", "n_tri_tiles")
)
def _launch(o, d, tmin, tmax, tri_pack, n_tris: int, n_tri_tiles: int,
            cull_backface: bool, interpret: bool):
    n_pad = o.shape[0]
    grid = (n_pad // RAY_BLOCK,)
    ray_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (RAY_BLOCK, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        tri_pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, n_tri_tiles=n_tri_tiles, n_tris=n_tris, cull_backface=cull_backface
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(1), ray_spec(1), tri_spec],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(o, d, tmin, tmax, tri_pack)


def _pad_rays(a, n, n_pad, width):
    return jnp.pad(a.reshape(n, width), ((0, n_pad - n), (0, 0)))


def _ray_buffers(origin, direction, t_min, t_max, shape):
    n = 1
    for s in shape:
        n *= s
    n_pad = max(RAY_BLOCK, ((n + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK)
    o = _pad_rays(origin, n, n_pad, 3)
    d = _pad_rays(direction, n, n_pad, 3)
    tmin = _pad_rays(
        jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)[..., None], n, n_pad, 1
    )
    if t_max is None:
        tmax = jnp.full((n_pad, 1), _BIG, jnp.float32)
    else:
        tmax = _pad_rays(
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)[..., None],
            n, n_pad, 1,
        )
    return o, d, tmin, tmax, n


def intersect_pallas(
    tris: TriSoA,
    origin,
    direction,
    t_min,
    t_max=None,
    closest: bool = True,
    cull_backface: bool = False,
    tri_pack=None,
    interpret: bool | None = None,
) -> HitRecord:
    """Drop-in replacement for accel.traverse.intersect_brute."""
    del closest  # dense search always yields the closest hit
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    o, d, tmin, tmax, n = _ray_buffers(origin, direction, t_min, t_max, shape)
    if tri_pack is None:
        tri_pack = pack_triangles(tris)
    n_tris = tris.v0.shape[0]
    n_tri_tiles = tri_pack.shape[1] // TRI_TILE

    t, tri, u, v = _launch(
        o, d, tmin, tmax, tri_pack, n_tris, n_tri_tiles, cull_backface, interpret
    )
    miss = tri[:n, 0] < 0
    t_out = jnp.where(miss, _BIG, t[:n, 0])
    return HitRecord(
        t=t_out.reshape(shape),
        tri=tri[:n, 0].reshape(shape),
        bary_u=u[:n, 0].reshape(shape),
        bary_v=v[:n, 0].reshape(shape),
    )


def _occlusion_kernel(o_ref, d_ref, tmin_ref, tmax_ref, tri_ref, hit_ref,
                      *, n_tri_tiles: int, n_tris: int):
    """Any-hit query: one OR-reduce per chunk, no closest-hit bookkeeping —
    the ACCEPT_FIRST_HIT_AND_END_SEARCH shadow ray (standardShadowRay.hlsli)."""
    o3 = o_ref[:, 0:3]
    d3 = d_ref[:, 0:3]
    tmin = tmin_ref[:, 0:1]
    tmax = tmax_ref[:, 0:1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TRI_TILE), 1)

    any_hit = jnp.zeros((RAY_BLOCK, 1), jnp.float32)
    for c in range(n_tri_tiles):
        sl = slice(c * TRI_TILE, (c + 1) * TRI_TILE)
        valid, t, u, v = bw_intersect_chunk(
            o3, d3, tri_ref, sl, tmin, tmax, cull_backface=False
        )
        valid = valid & ((lane + c * TRI_TILE) < n_tris)
        any_hit = any_hit + jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
    hit_ref[:, :] = any_hit


@functools.partial(jax.jit, static_argnames=("interpret", "n_tris", "n_tri_tiles"))
def _launch_occlusion(o, d, tmin, tmax, tri_pack, n_tris, n_tri_tiles, interpret):
    n_pad = o.shape[0]
    grid = (n_pad // RAY_BLOCK,)
    ray_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (RAY_BLOCK, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(tri_pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _occlusion_kernel, n_tri_tiles=n_tri_tiles, n_tris=n_tris
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(1), ray_spec(1), tri_spec],
        out_specs=pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )(o, d, tmin, tmax, tri_pack)


def occluded_pallas(tris, origin, direction, t_min, t_max=None, tri_pack=None,
                    interpret: bool | None = None):
    """Boolean any-hit query over the ray wavefront (alpha test N/A)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    o, d, tmin, tmax, n = _ray_buffers(origin, direction, t_min, t_max, shape)
    if tri_pack is None:
        tri_pack = pack_triangles(tris)
    n_tris = tris.v0.shape[0]
    n_tri_tiles = tri_pack.shape[1] // TRI_TILE
    hits = _launch_occlusion(o, d, tmin, tmax, tri_pack, n_tris, n_tri_tiles, interpret)
    return (hits[:n, 0] > 0).reshape(shape)
