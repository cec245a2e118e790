"""Fused Pallas intersection + closest-hit shading-attribute kernel.

This is the wavefront analogue of a DXR closest-hit shader running inside the
traversal (getHitShadingData, BDPTUtils.hlsli:56-61): the kernel that finds
the closest triangle also interpolates its vertex attributes and fetches its
material constants — all from a per-triangle pack resident in VMEM — so the
hit wavefront leaves the kernel shading-ready.  This removes every
per-bounce HBM gather (triangle attrs + material rows), which measure ~5-7 ms
each at 1M rays on v5e.

Intersection is the Baldwin-Weber form (see accel.pallas_intersect): the six
per-pair dot products ride the MXU.

Pack layout [ROWS=48, T_pad]:
   0:12  Baldwin-Weber rows (n, n.v0, r1, r1.v0, r2, r2.v0)
  12:21  n0, n1, n2                (vertex normals)
  21:27  uv0, uv1, uv2
  27:31  base_color rgba           (material constants, pre-gathered per tri)
  31:35  specular rgba
  35:38  emissive rgb
  38     ior
  39     shading_model
  40     double_sided
  41     base_color_tex, 42 specular_tex, 43 emissive_tex
  44     material id

Output [N_pad, 32] f32 field table:
   0 t, 1 tri, 2 u, 3 v, 4:7 n (interp, unnormalized), 7:9 uv,
   9:13 dif rgba, 13:17 spec rgba, 17:20 emissive, 20 ior,
  21 shading_model, 22 double_sided, 23:26 tex ids, 26 material id.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import MaterialArray
from .pallas_intersect import (
    RAY_BLOCK,
    TRI_TILE,
    _BIG,
    _ray_buffers,
    bw_intersect_chunk,
    pack_triangles,
)
from .traverse import HitRecord, TriSoA

ROWS = 48
OUT_W = 32

_ATTR_LO = 12
_ATTR_HI = 45


def pack_shaded_triangles(tris: TriSoA, materials: MaterialArray):
    """Build the [ROWS, T_pad] pack (host/trace time, fused by XLA)."""
    bw = pack_triangles(tris)  # [16, T_pad] (12 used)
    t = tris.v0.shape[0]
    t_pad = bw.shape[1]
    m = jnp.maximum(tris.material_id, 0)
    attr = jnp.concatenate(
        [
            tris.n0.T, tris.n1.T, tris.n2.T,
            tris.uv0.T, tris.uv1.T, tris.uv2.T,
            materials.base_color[m].T,
            materials.specular[m].T,
            materials.emissive[m].T,
            materials.ior[m][None, :],
            materials.shading_model[m].astype(jnp.float32)[None, :],
            materials.double_sided[m].astype(jnp.float32)[None, :],
            materials.base_color_tex[m].astype(jnp.float32)[None, :],
            materials.specular_tex[m].astype(jnp.float32)[None, :],
            materials.emissive_tex[m].astype(jnp.float32)[None, :],
            tris.material_id.astype(jnp.float32)[None, :],
        ],
        axis=0,
    )  # [33, T]
    attr = jnp.pad(attr, ((0, 0), (0, t_pad - t)))
    rows = jnp.concatenate([bw[:12], attr], axis=0)  # [45, T_pad]
    return jnp.pad(rows, ((0, ROWS - rows.shape[0]), (0, 0)))


def _kernel(o_ref, d_ref, tmin_ref, tmax_ref, tri_ref, out_ref,
            *, n_tri_tiles: int, n_tris: int, cull_backface: bool):
    o3 = o_ref[:, 0:3]
    d3 = d_ref[:, 0:3]
    tmin = tmin_ref[:, 0:1]

    best_t = tmax_ref[:, 0:1] * jnp.ones((RAY_BLOCK, 1), jnp.float32)
    best_id = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    best_u = jnp.zeros((RAY_BLOCK, 1), jnp.float32)
    best_v = jnp.zeros((RAY_BLOCK, 1), jnp.float32)

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
        is_min = (t_m == row_min) & valid
        first = jnp.min(jnp.where(is_min, lane_f, 1e9), axis=1, keepdims=True)
        pick = (lane_f == first) & is_min
        new_id = jnp.sum(jnp.where(pick, tri_ids, 0), axis=1, keepdims=True)
        best_id = jnp.where(improved, new_id, best_id)
        best_t = jnp.where(improved, row_min, best_t)

    # second sweep: fetch the winning triangle's BW constants + attribute
    # rows via a one-hot [B,T] x [T, rows] matmul per chunk (MXU), then
    # recompute u/v from the constants — cheaper than per-chunk masked
    # select-reduces for every field.
    n_fetch = _ATTR_HI  # BW rows 0:12 + attrs 12:45
    fetched = jnp.zeros((RAY_BLOCK, n_fetch), jnp.float32)
    for c in range(n_tri_tiles):
        sl = slice(c * TRI_TILE, (c + 1) * TRI_TILE)
        local = best_id - c * TRI_TILE
        pick = ((lane == local) & (local >= 0) & (local < TRI_TILE)).astype(jnp.float32)
        block = tri_ref[0:_ATTR_HI, sl]  # [rows, T]
        fetched = fetched + jax.lax.dot_general(
            pick, block, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact one-hot fetch
        )
    # u = (r1.o - r1.v0) + t*(r1.d); v likewise (Baldwin-Weber affine form)
    r1_ = fetched[:, 4:7]
    r2_ = fetched[:, 8:11]
    dot_rows = lambda r, a: (  # noqa: E731
        r[:, 0:1] * a[:, 0:1] + r[:, 1:2] * a[:, 1:2] + r[:, 2:3] * a[:, 2:3]
    )
    best_u = (dot_rows(r1_, o3) - fetched[:, 7:8]) + best_t * dot_rows(r1_, d3)
    best_v = (dot_rows(r2_, o3) - fetched[:, 11:12]) + best_t * dot_rows(r2_, d3)
    hit_mask = (best_id >= 0).astype(jnp.float32)
    best_u = best_u * hit_mask
    best_v = best_v * hit_mask
    attrs = fetched[:, _ATTR_LO:_ATTR_HI]

    bw_ = 1.0 - best_u - best_v
    nx = bw_ * attrs[:, 0:1] + best_u * attrs[:, 3:4] + best_v * attrs[:, 6:7]
    ny = bw_ * attrs[:, 1:2] + best_u * attrs[:, 4:5] + best_v * attrs[:, 7:8]
    nz = bw_ * attrs[:, 2:3] + best_u * attrs[:, 5:6] + best_v * attrs[:, 8:9]
    uvx = bw_ * attrs[:, 9:10] + best_u * attrs[:, 11:12] + best_v * attrs[:, 13:14]
    uvy = bw_ * attrs[:, 10:11] + best_u * attrs[:, 12:13] + best_v * attrs[:, 14:15]

    cols = [
        best_t, best_id.astype(jnp.float32), best_u, best_v,
        nx, ny, nz, uvx, uvy,
        attrs[:, 15:33],  # material rows 27..44 -> output cols 9..26
    ]
    out = jnp.concatenate(cols, axis=1)
    pad = OUT_W - out.shape[1]
    if pad:
        out = jnp.concatenate(
            [out, jnp.zeros((RAY_BLOCK, pad), jnp.float32)], axis=1
        )
    out_ref[:, :] = out


@functools.partial(
    jax.jit, static_argnames=("cull_backface", "interpret", "n_tris", "n_tri_tiles")
)
def _launch(o, d, tmin, tmax, tri_pack, n_tris, n_tri_tiles, cull_backface, interpret):
    n_pad = o.shape[0]
    grid = (n_pad // RAY_BLOCK,)
    ray_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (RAY_BLOCK, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(tri_pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, n_tri_tiles=n_tri_tiles, n_tris=n_tris, cull_backface=cull_backface
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(1), ray_spec(1), tri_spec],
        out_specs=pl.BlockSpec((RAY_BLOCK, OUT_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, OUT_W), jnp.float32),
        interpret=interpret,
    )(o, d, tmin, tmax, tri_pack)


def intersect_shaded(
    tris: TriSoA,
    tri_pack,
    origin,
    direction,
    t_min,
    t_max=None,
    cull_backface: bool = False,
    interpret: bool | None = None,
):
    """Returns (HitRecord, fields [..., OUT_W]) — fields per the layout doc."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    o, d, tmin, tmax, n = _ray_buffers(origin, direction, t_min, t_max, shape)
    n_tris = tris.v0.shape[0]
    n_tri_tiles = tri_pack.shape[1] // TRI_TILE
    out = _launch(o, d, tmin, tmax, tri_pack, n_tris, n_tri_tiles, cull_backface, interpret)
    fields = out[:n].reshape(shape + (OUT_W,))
    tri = fields[..., 1].astype(jnp.int32)
    miss = tri < 0
    hit = HitRecord(
        t=jnp.where(miss, _BIG, fields[..., 0]),
        tri=tri,
        bary_u=fields[..., 2],
        bary_v=fields[..., 3],
    )
    return hit, fields
