"""Ray-in-lanes Pallas kernels (the fast production intersectors).

Measured on v5e: a pallas_call whose ray inputs are [RAY_BLOCK, 3]-shaped
blocks pays a ~5-6 ms fixed cost per launch at ~1M rays — the (B, 3) blocks
tile as (8,128) vregs with 3/128 lanes used, so the HBM<->VMEM DMA runs at
~1/40 of peak.  Laying rays out FIELD-MAJOR — [fields, N/128, 128] with the
ray index in the lane dimension — drops the same trivial kernel to ~0.2 ms.

Kernels here use that layout:
  * ray fields: [8, n_cols, 128] rows = ox oy oz dx dy dz tmin tmax;
    a grid cell covers S=8 lane-rows = 1024 rays.
  * triangles: Baldwin-Weber constants [T_pad, 16] (rows = triangles, in
    sublanes); the pair test per lane-row is a [T_chunk, 128] tile —
    triangles broadcast down sublanes, rays across lanes — with sublane
    reductions for closest/any-hit.
  * winner attributes fetch via one-hot [A, T] @ [T, 128] matmuls (MXU) and
    the shading decode runs on stacked [8, 128] full tiles.

Output field table matches accel.pallas_shaded's layout (OUT_W columns), so
ops.shading.shading_from_fields consumes either kernel's result.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import MaterialArray
from .traverse import HitRecord, TriSoA
from .pallas_intersect import pack_triangles as pack_bw_rows

S = 8            # lane-rows per grid cell (8 x 128 = 1024 rays)
LANE = 128
TRI_CHUNK = 256  # max triangle sublanes per inner tile
_SUBLANE = 8     # f32 sublane granularity — pads round up to this
_BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tri_pad_rows(t: int) -> int:
    """Rows a [T_pad, *] lane pack needs: multiple of 8 sublanes, with only
    the LAST chunk partial (small scenes pay for T rounded to 8, not 256)."""
    return max(_SUBLANE, _round_up(t, _SUBLANE))


def chunk_bounds(t_pad: int):
    """Static (start, size) tile bounds covering [0, t_pad) in <=256-row
    slices; each size is a multiple of 8 so every tile is VPU-legal."""
    return tuple(
        (s, min(TRI_CHUNK, t_pad - s)) for s in range(0, t_pad, TRI_CHUNK)
    )

OUT_W = 32  # same field table as pallas_shaded

# attr rows in the [T, 48] shaded pack (see pallas_shaded docstring)
_ATTR_LO = 12
_ATTR_HI = 45


def pack_tris_lane(tris: TriSoA):
    """[T_pad, 16] Baldwin-Weber rows-per-triangle (sublane-major)."""
    rows = pack_bw_rows(tris)  # [16, T_pad_lane]
    t = tris.v0.shape[0]
    t_pad = tri_pad_rows(t)
    out = rows.T  # [T_pad_lane, 16]
    if out.shape[0] < t_pad:
        out = jnp.pad(out, ((0, t_pad - out.shape[0]), (0, 0)))
    return out[:t_pad]


def pack_shaded_tris_lane(tris: TriSoA, materials: MaterialArray):
    """[T_pad, 48] shaded pack, rows per triangle."""
    from .pallas_shaded import pack_shaded_triangles

    pack = pack_shaded_triangles(tris, materials)  # [48, T_pad_lane]
    t_pad = tri_pad_rows(int(tris.v0.shape[0]))
    out = pack.T
    if out.shape[0] < t_pad:
        out = jnp.pad(out, ((0, t_pad - out.shape[0]), (0, 0)))
    return out[:t_pad]


def rays_to_rows(origin, direction, t_min, t_max, shape):
    """Pack rays field-major: [8, n_cols, 128]; returns (rows, n, n_cols)."""
    n = 1
    for s_ in shape:
        n *= s_
    n_pad = max(S * LANE, ((n + S * LANE - 1) // (S * LANE)) * (S * LANE))
    n_cols = n_pad // LANE

    def field(x):
        return jnp.pad(x.reshape(-1), (0, n_pad - n)).reshape(1, n_cols, LANE)

    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)
    if t_max is None:
        tmax = jnp.full(shape, _BIG, jnp.float32)
    else:
        tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    rows = jnp.concatenate(
        [field(origin[..., k]) for k in range(3)]
        + [field(direction[..., k]) for k in range(3)]
        + [field(tmin), field(tmax)],
        axis=0,
    )
    return rows, n, n_cols


# Compute the six Baldwin-Weber dot products on the MXU instead of the VPU:
# ONE [T,16] @ [16, 6*128] f32 matmul (the -v0 constant terms fold in as -1
# rhs rows) would leave ~14 VPU ops of the ~30 per [T,128] tile.
# MEASURED ON v5e: a 2x REGRESSION across every tier (Cornell bench 534 ->
# 290 Mrays/s, textured frame 162 -> 339 ms, pink cluster primary 39 -> 68,
# bounce 117 -> 253 ms/1M) — K=16 matmuls at Precision.HIGHEST (6 MXU
# passes) with T<=256 sublane blocks never amortize the systolic fill, and
# the rhs rebuild per lane-row adds vector traffic.  Kept OFF; retained
# because the shape of the attempt matters for future revisits (a bf16
# split or a [T>=1024] restructure might change the verdict).
MXU_PAIR = False


def _bw_pair_mxu(pack16, o, d, tmin, tmax, cull_backface):
    """Baldwin-Weber test of a [T, >=16] pack block against one lane-row.

    pack16: [T, >=16] value (cols 0:3 n/nv0, 4:7 r1/r1v0, 8:11 r2/r2v0);
    o, d: ([1,128],)*3 ray tiles.  Returns (valid [T,128], t [T,128])."""
    zero = jnp.zeros((1, LANE), jnp.float32)
    neg1 = jnp.full((1, LANE), -1.0, jnp.float32)

    def rows_o(base):  # rows base..base+2 = origin, base+3 = -1 (the -v0)
        rows = [zero] * 16
        rows[base] = o[0]
        rows[base + 1] = o[1]
        rows[base + 2] = o[2]
        rows[base + 3] = neg1
        return rows

    def rows_d(base):
        rows = [zero] * 16
        rows[base] = d[0]
        rows[base + 1] = d[1]
        rows[base + 2] = d[2]
        return rows

    rhs = jnp.concatenate(
        [jnp.concatenate(blk, axis=0)
         for blk in (rows_o(0), rows_d(0), rows_o(4), rows_d(4),
                     rows_o(8), rows_d(8))],
        axis=1,
    )  # [16, 768]
    out = jax.lax.dot_general(
        pack16[:, 0:16], rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [T, 768]
    no_ = out[:, 0 * LANE:1 * LANE]    # n.o - nv0
    nd = out[:, 1 * LANE:2 * LANE]     # n.d
    r1o = out[:, 2 * LANE:3 * LANE]    # r1.o - r1v0
    r1d = out[:, 3 * LANE:4 * LANE]
    r2o = out[:, 4 * LANE:5 * LANE]
    r2d = out[:, 5 * LANE:6 * LANE]
    if cull_backface:
        dir_ok = nd < -1e-9
    else:
        dir_ok = jnp.abs(nd) > 1e-9
    t = -no_ / jnp.where(dir_ok, nd, 1.0)
    u = r1o + t * r1d
    v = r2o + t * r2d
    valid = (
        dir_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    return valid, t


def _pair_test(tri_ref, sl, ox, oy, oz, dx, dy, dz, tmin, tmax, cull_backface):
    """[T_chunk, 128] Baldwin-Weber test for one lane-row of rays."""
    if MXU_PAIR:
        return _bw_pair_mxu(tri_ref[sl, 0:16], (ox, oy, oz), (dx, dy, dz),
                            tmin, tmax, cull_backface)
    col = lambda k: tri_ref[sl, k:k + 1]  # noqa: E731  [T_chunk, 1]
    nx, ny, nz, nv0 = col(0), col(1), col(2), col(3)
    ndir = nx * dx + ny * dy + nz * dz
    if cull_backface:
        dir_ok = ndir < -1e-9
    else:
        dir_ok = jnp.abs(ndir) > 1e-9
    t = (nv0 - (nx * ox + ny * oy + nz * oz)) / jnp.where(dir_ok, ndir, 1.0)
    r1x, r1y, r1z, r1v0 = col(4), col(5), col(6), col(7)
    u = (r1x * ox + r1y * oy + r1z * oz - r1v0) + t * (r1x * dx + r1y * dy + r1z * dz)
    r2x, r2y, r2z, r2v0 = col(8), col(9), col(10), col(11)
    v = (r2x * ox + r2y * oy + r2z * oz - r2v0) + t * (r2x * dx + r2y * dy + r2z * dz)
    valid = (
        dir_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    return valid, t


def _occlusion_kernel(r_ref, tri_ref, out_ref, *, bounds, n_tris):
    rows = []
    for s in range(S):
        ox = r_ref[0, s:s + 1, :]
        oy = r_ref[1, s:s + 1, :]
        oz = r_ref[2, s:s + 1, :]
        dx = r_ref[3, s:s + 1, :]
        dy = r_ref[4, s:s + 1, :]
        dz = r_ref[5, s:s + 1, :]
        tmin = r_ref[6, s:s + 1, :]
        tmax = r_ref[7, s:s + 1, :]
        hit = jnp.zeros((1, LANE), jnp.float32)
        for start, size in bounds:
            sl = slice(start, start + size)
            valid, _ = _pair_test(
                tri_ref, sl, ox, oy, oz, dx, dy, dz, tmin, tmax, False
            )
            sub = jax.lax.broadcasted_iota(jnp.int32, (size, LANE), 0)
            valid = valid & ((sub + start) < n_tris)
            hit = hit + jnp.sum(valid.astype(jnp.float32), axis=0, keepdims=True)
        rows.append(hit)
    out_ref[...] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("bounds", "n_tris", "interpret"))
def _launch_occlusion(rows, tri_pack, bounds, n_tris, interpret):
    n_cols = rows.shape[1]
    return pl.pallas_call(
        functools.partial(_occlusion_kernel, bounds=bounds, n_tris=n_tris),
        grid=(n_cols // S,),
        in_specs=[
            pl.BlockSpec((8, S, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cols, LANE), jnp.float32),
        interpret=interpret,
    )(rows, tri_pack)


def occluded_lanes(tris, origin, direction, t_min, t_max=None, tri_pack=None,
                   interpret: bool | None = None):
    """Boolean any-hit query (ray-in-lanes layout)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    if tri_pack is None:
        tri_pack = pack_tris_lane(tris)
    bounds = chunk_bounds(tri_pack.shape[0])
    hits = _launch_occlusion(rows, tri_pack, bounds, int(tris.v0.shape[0]), interpret)
    return (hits.reshape(-1)[:n] > 0).reshape(shape)


def _shaded_kernel(r_ref, tri_ref, out_ref, *, bounds, n_tris, cull_backface):
    per_row = {"t": [], "id": [], "u": [], "v": []}
    attr_rows = []
    for s in range(S):
        ox = r_ref[0, s:s + 1, :]
        oy = r_ref[1, s:s + 1, :]
        oz = r_ref[2, s:s + 1, :]
        dx = r_ref[3, s:s + 1, :]
        dy = r_ref[4, s:s + 1, :]
        dz = r_ref[5, s:s + 1, :]
        tmin = r_ref[6, s:s + 1, :]
        tmax = r_ref[7, s:s + 1, :]
        best_t = tmax * jnp.ones((1, LANE), jnp.float32)
        best_id = jnp.full((1, LANE), -1, jnp.int32)
        for start, size in bounds:
            sl = slice(start, start + size)
            valid, t = _pair_test(
                tri_ref, sl, ox, oy, oz, dx, dy, dz, tmin, best_t, cull_backface
            )
            sub = jax.lax.broadcasted_iota(jnp.int32, (size, LANE), 0)
            tri_ids = sub + start
            valid = valid & (tri_ids < n_tris)
            t_m = jnp.where(valid, t, _BIG)
            col_min = jnp.min(t_m, axis=0, keepdims=True)          # [1,128]
            improved = col_min < best_t
            is_min = (t_m == col_min) & valid
            sub_f = sub.astype(jnp.float32)
            first = jnp.min(jnp.where(is_min, sub_f, 1e9), axis=0, keepdims=True)
            pick = (sub_f == first) & is_min
            new_id = jnp.sum(
                jnp.where(pick, tri_ids, 0), axis=0, keepdims=True
            )
            best_id = jnp.where(improved, new_id, best_id)
            best_t = jnp.where(improved, col_min, best_t)

        # winner fetch: one-hot [T,128] per chunk, rows 0..44 via MXU
        fetched = jnp.zeros((_ATTR_HI, LANE), jnp.float32)
        for start, size in bounds:
            sl = slice(start, start + size)
            sub = jax.lax.broadcasted_iota(jnp.int32, (size, LANE), 0)
            local = best_id - start
            pick = ((sub == local) & (local >= 0) & (local < size)).astype(
                jnp.float32
            )
            block = tri_ref[sl, 0:_ATTR_HI]  # [T_chunk, 45]
            fetched = fetched + jax.lax.dot_general(
                block, pick, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # exact one-hot fetch
            )  # [45, 128]

        r1 = fetched[4:7]
        r2 = fetched[8:11]
        u = (r1[0:1] * ox + r1[1:2] * oy + r1[2:3] * oz - fetched[7:8]) + best_t * (
            r1[0:1] * dx + r1[1:2] * dy + r1[2:3] * dz
        )
        v = (r2[0:1] * ox + r2[1:2] * oy + r2[2:3] * oz - fetched[11:12]) + best_t * (
            r2[0:1] * dx + r2[1:2] * dy + r2[2:3] * dz
        )
        hit_f = (best_id >= 0).astype(jnp.float32)
        per_row["t"].append(best_t)
        per_row["id"].append(best_id.astype(jnp.float32))
        per_row["u"].append(u * hit_f)
        per_row["v"].append(v * hit_f)
        attr_rows.append(fetched[_ATTR_LO:_ATTR_HI] )  # [33, 128]

    # assemble the OUT_W field table rows: stack per-row results to [S,128]
    t_ = jnp.concatenate(per_row["t"], axis=0)
    id_ = jnp.concatenate(per_row["id"], axis=0)
    u_ = jnp.concatenate(per_row["u"], axis=0)
    v_ = jnp.concatenate(per_row["v"], axis=0)
    w_ = 1.0 - u_ - v_

    def attr(k):  # stacked attr row k over the S lane-rows -> [S, 128]
        return jnp.concatenate([attr_rows[s][k:k + 1] for s in range(S)], axis=0)

    nx = w_ * attr(0) + u_ * attr(3) + v_ * attr(6)
    ny = w_ * attr(1) + u_ * attr(4) + v_ * attr(7)
    nz = w_ * attr(2) + u_ * attr(5) + v_ * attr(8)
    uvx = w_ * attr(9) + u_ * attr(11) + v_ * attr(13)
    uvy = w_ * attr(10) + u_ * attr(12) + v_ * attr(14)

    fields = [t_, id_, u_, v_, nx, ny, nz, uvx, uvy] + [
        attr(k) for k in range(15, 33)
    ]
    while len(fields) < OUT_W:
        fields.append(jnp.zeros((S, LANE), jnp.float32))
    for k, f_ in enumerate(fields):
        out_ref[k] = f_


@functools.partial(
    jax.jit, static_argnames=("bounds", "n_tris", "cull_backface", "interpret")
)
def _launch_shaded(rows, tri_pack, bounds, n_tris, cull_backface, interpret):
    n_cols = rows.shape[1]
    return pl.pallas_call(
        functools.partial(
            _shaded_kernel, bounds=bounds, n_tris=n_tris,
            cull_backface=cull_backface,
        ),
        grid=(n_cols // S,),
        in_specs=[
            pl.BlockSpec((8, S, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT_W, S, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_W, n_cols, LANE), jnp.float32),
        interpret=interpret,
    )(rows, tri_pack)


def intersect_shaded_lanes(
    tris: TriSoA,
    tri_pack,
    origin,
    direction,
    t_min,
    t_max=None,
    cull_backface: bool = False,
    interpret: bool | None = None,
):
    """Returns (HitRecord, fields [..., OUT_W]) like pallas_shaded."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    bounds = chunk_bounds(tri_pack.shape[0])
    out = _launch_shaded(
        rows, tri_pack, bounds, int(tris.v0.shape[0]), cull_backface, interpret
    )  # [OUT_W, n_cols, 128]
    fields = out.reshape(OUT_W, -1)[:, :n].T.reshape(shape + (OUT_W,))
    tri = fields[..., 1].astype(jnp.int32)
    miss = tri < 0
    hit = HitRecord(
        t=jnp.where(miss, _BIG, fields[..., 0]),
        tri=tri,
        bary_u=fields[..., 2],
        bary_v=fields[..., 3],
    )
    return hit, fields


def intersect_shaded_lanes_fm(
    tris: TriSoA,
    tri_pack,
    origin,
    direction,
    t_min,
    t_max=None,
    cull_backface: bool = False,
    interpret: bool | None = None,
):
    """Field-major variant: (HitRecord, fields_fm [OUT_W, ...shape]) without
    the [N, OUT_W] transpose; decode with shading_from_fields_fm."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    bounds = chunk_bounds(tri_pack.shape[0])
    out = _launch_shaded(
        rows, tri_pack, bounds, int(tris.v0.shape[0]), cull_backface, interpret
    )
    flat = out.reshape(OUT_W, -1)[:, :n]
    fields_fm = flat.reshape((OUT_W,) + shape)
    tri = fields_fm[1].astype(jnp.int32)
    miss = tri < 0
    hit = HitRecord(
        t=jnp.where(miss, _BIG, fields_fm[0]),
        tri=tri,
        bary_u=fields_fm[2],
        bary_v=fields_fm[3],
    )
    return hit, fields_fm
