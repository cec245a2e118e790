"""Fused Pallas intersection + closest-hit shading-attribute kernel.

This is the wavefront analogue of a DXR closest-hit shader running inside the
traversal (getHitShadingData, BDPTUtils.hlsli:56-61): the kernel that finds
the closest triangle also interpolates its vertex attributes and fetches its
material constants — all from a per-triangle pack resident in VMEM — so the
hit wavefront leaves the kernel shading-ready.  This removes every
per-bounce HBM gather (triangle attrs + material rows), which measure ~5-7 ms
each at 1M rays on v5e.

Pack layout [ROWS, T_pad] (ROWS=48, padded from 42):
   0:9   v0, e1, e2                (geometry)
   9:18  n0, n1, n2                (vertex normals)
  18:24  uv0, uv1, uv2
  24:28  base_color rgba           (material constants, pre-gathered per tri)
  28:32  specular rgba
  32:35  emissive rgb
  35     ior
  36     shading_model
  37     double_sided
  38     base_color_tex, 39 specular_tex, 40 emissive_tex
  41     material id

Output [N_pad, 32] f32 field table:
   0 t, 1 tri, 2 u, 3 v, 4:7 n (interp, unnormalized), 7:9 uv,
   9:13 dif rgba, 13:17 spec rgba, 17:20 emissive, 20 ior,
  21 shading_model, 22 double_sided, 23:26 tex ids, rest pad.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import MaterialArray
from .traverse import HitRecord, TriSoA

RAY_BLOCK = 256
TRI_TILE = 128
ROWS = 48
OUT_W = 32
_BIG = 1e30

# attribute rows fetched for the best hit (18..41 inclusive)
_ATTR_LO = 9
_ATTR_HI = 42


def pack_shaded_triangles(tris: TriSoA, materials: MaterialArray):
    """Build the [ROWS, T_pad] pack (host/trace time, fused by XLA)."""
    t = tris.v0.shape[0]
    m = jnp.maximum(tris.material_id, 0)
    rows = jnp.concatenate(
        [
            tris.v0.T, tris.e1.T, tris.e2.T,
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
    )  # [42, T]
    t_pad = max(TRI_TILE, ((t + TRI_TILE - 1) // TRI_TILE) * TRI_TILE)
    rows = jnp.pad(rows, ((0, ROWS - rows.shape[0]), (0, t_pad - t)))
    return rows


def _kernel(o_ref, d_ref, tmin_ref, tmax_ref, tri_ref, out_ref,
            *, n_tri_tiles: int, n_tris: int, cull_backface: bool):
    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    tmin = tmin_ref[:, 0:1]

    best_t = tmax_ref[:, 0:1] * jnp.ones((RAY_BLOCK, 1), jnp.float32)
    best_id = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    best_u = jnp.zeros((RAY_BLOCK, 1), jnp.float32)
    best_v = jnp.zeros((RAY_BLOCK, 1), jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TRI_TILE), 1)
    lane_f = lane.astype(jnp.float32)

    for c in range(n_tri_tiles):
        sl = slice(c * TRI_TILE, (c + 1) * TRI_TILE)
        v0x = tri_ref[0:1, sl]
        v0y = tri_ref[1:2, sl]
        v0z = tri_ref[2:3, sl]
        e1x = tri_ref[3:4, sl]
        e1y = tri_ref[4:5, sl]
        e1z = tri_ref[5:6, sl]
        e2x = tri_ref[6:7, sl]
        e2y = tri_ref[7:8, sl]
        e2z = tri_ref[8:9, sl]

        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        if cull_backface:
            det_ok = det > 1e-9
        else:
            det_ok = jnp.abs(det) > 1e-9
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        tri_ids = lane + c * TRI_TILE
        valid = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > tmin) & (t < best_t) & (tri_ids < n_tris)
        )
        t_m = jnp.where(valid, t, _BIG)
        row_min = jnp.min(t_m, axis=1, keepdims=True)
        improved = row_min < best_t
        is_min = (t_m == row_min) & valid
        first = jnp.min(jnp.where(is_min, lane_f, 1e9), axis=1, keepdims=True)
        pick = (lane_f == first) & is_min
        sel = lambda a, b: jnp.where(  # noqa: E731
            improved, jnp.sum(jnp.where(pick, a, 0.0), axis=1, keepdims=True), b
        )
        new_id = jnp.sum(jnp.where(pick, tri_ids, 0), axis=1, keepdims=True)
        best_u = sel(u, best_u)
        best_v = sel(v, best_v)
        best_id = jnp.where(improved, new_id, best_id)
        best_t = jnp.where(improved, row_min, best_t)

    # second sweep: fetch attribute rows of the winning triangle
    attrs = [jnp.zeros((RAY_BLOCK, 1), jnp.float32) for _ in range(_ATTR_HI - _ATTR_LO)]
    for c in range(n_tri_tiles):
        sl = slice(c * TRI_TILE, (c + 1) * TRI_TILE)
        local = best_id - c * TRI_TILE
        pick = (lane == local) & (local >= 0) & (local < TRI_TILE)
        pick_f = pick.astype(jnp.float32)
        for k in range(_ATTR_HI - _ATTR_LO):
            row = tri_ref[_ATTR_LO + k:_ATTR_LO + k + 1, sl]
            attrs[k] = attrs[k] + jnp.sum(row * pick_f, axis=1, keepdims=True)

    bw = 1.0 - best_u - best_v
    n0 = attrs[0:3]
    n1 = attrs[3:6]
    n2 = attrs[6:9]
    nx = bw * n0[0] + best_u * n1[0] + best_v * n2[0]
    ny = bw * n0[1] + best_u * n1[1] + best_v * n2[1]
    nz = bw * n0[2] + best_u * n1[2] + best_v * n2[2]
    uvx = bw * attrs[9] + best_u * attrs[11] + best_v * attrs[13]
    uvy = bw * attrs[10] + best_u * attrs[12] + best_v * attrs[14]

    cols = [
        best_t, best_id.astype(jnp.float32), best_u, best_v,
        nx, ny, nz, uvx, uvy,
    ] + attrs[15:]  # material rows 24..41 -> output cols 9..26
    while len(cols) < OUT_W:
        cols.append(jnp.zeros((RAY_BLOCK, 1), jnp.float32))
    out_ref[:, :] = jnp.concatenate(cols, axis=1)


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
    n = 1
    for s in shape:
        n *= s
    n_pad = max(RAY_BLOCK, ((n + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK)

    def pad_rays(a, width):
        return jnp.pad(a.reshape(n, width), ((0, n_pad - n), (0, 0)))

    o = pad_rays(origin, 3)
    d = pad_rays(direction, 3)
    tmin = pad_rays(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)[..., None], 1)
    if t_max is None:
        tmax = jnp.full((n_pad, 1), _BIG, jnp.float32)
    else:
        tmax = pad_rays(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)[..., None], 1)

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
