"""Two-level clustered Pallas intersectors (medium scenes, 2k-64k tris).

The reference leans on DXR's hardware BVH (TraceRay over the TLAS built in
RtScene.cpp:220-308 / RtModel.cpp:181-254).  A pointer-chasing BVH is the
wrong shape for a vector machine: per-ray node cursors mean per-lane gathers
(~5-10 ms per 1M on TPU) every traversal step.  Instead this module keeps
the *hierarchy* but flattens it to exactly two levels, sized for the TPU
memory system:

  * bottom level: clusters of CK=256 consecutive triangles of the BVH's
    DFS-ordered triangle array (accel.bvh stores leaves depth-first, so a
    contiguous run IS a spatial subtree); each cluster's pair test is the
    same dense [256, 128] Baldwin-Weber tile accel.pallas_lane uses — fully
    regular VPU/MXU work, triangles resident in VMEM.
  * top level: one AABB per cluster in SMEM.  Per [8,128]-ray grid cell the
    kernel slab-tests each cluster against all 1024 rays and *skips the
    whole pair-test tile* (`pl.when`) when no ray's current [t_min, best_t)
    interval overlaps the box — the SIMD analogue of BVH early-out, at tile
    rather than ray granularity.

Closest-hit also shrinks best_t as clusters complete, so later clusters are
culled against tightened intervals; each cell loops only its EXACT cluster
shortlist (cell_cluster_shortlist — the union of per-ray slab tests, hoisted
into XLA prep), visits it front-to-back by conservative entry-t, and exits
the loop once every lane's min(best_t, tmax) beats the next entry (the
wavefront analogue of ordered BVH traversal termination).  The
winner-attribute fetch re-walks only clusters that own some lane's winning
triangle.  Any-hit stops once every lane in the cell is occluded.

Coherent wavefronts (primary rays, shadow rays to a common light) touch a
handful of clusters per cell; fully incoherent bounces degrade to the dense
cost, never worse than brute force.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import MaterialArray
from .traverse import HitRecord, TriSoA
from .pallas_lane import (
    LANE,
    OUT_W,
    S,
    _ATTR_HI,
    _ATTR_LO,
    rays_to_rows,
)

CK = 256          # cluster stride (triangles); multiple of 8 sublanes
_BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cell_rows() -> int:
    """Lane-rows (x128 lanes) per kernel program = sort-cell size / 128.

    Smaller cells tighten the per-cell EXACT cluster shortlists on
    divergent wavefronts (visits/cell 19.4 at 8 rows -> 13.4 at 2 on a
    cosine-bounce pink_room wavefront, pair work -33%; round-4 CPU sweep)
    — but MEASURED NEGATIVE in-frame on v5e: pink_room 681 -> 883 ms at
    2 rows (4x grid programs x ~9 us per-program overhead swamps the pair
    -work saving).  Default stays 8 (1024-ray cells); FYP_CELL_ROWS
    overrides for experiments."""
    import os

    v = int(os.environ.get("FYP_CELL_ROWS", "8"))
    if v < 1 or S % v:
        raise ValueError(f"FYP_CELL_ROWS={v} must divide S={S}")
    return v


def pick_ck(n_tris: int) -> int:
    """VMEM-tier cluster stride: the smallest multiple of 8 (>= 48) that
    keeps the cluster count <= 512.  FYP_CK overrides for experiments.

    Measured on v5e (benchmarks/pink_micro.py, pink_room 10.5k tris):
    ck=64 gives 38.9 ms/1M coherent closest rays vs ~77 ms at ck=256 —
    finer AABB culling granularity dominates the extra scalar cluster
    branches; going the other way, ck=512 doubles closest time at 63k tris
    (benchmarks/cluster_micro.py).  Round-5 whole-frame sweep refined the
    floor: ck=48 664.7/664.7 vs ck=64 676.5/677.2 vs ck=96 706.5 ms on
    the pink_room frame (two confirm runs each; ck=32 remains a wash from
    round 3 — the sweet spot is 6-row pair tiles).  The cap at 512
    clusters bounds the SMEM AABB table (16 KB) and the per-cell
    visit-order row.  The HBM-paged tier keeps CK=256: it is DMA-latency
    bound and smaller slices mean proportionally more round-trips."""
    import os

    env = os.environ.get("FYP_CK")
    if env:
        return max(8, _round_up(int(env), 8))
    return max(48, _round_up(-(-n_tris // 512), 8))


# ------------------------------------------------------------------- host
def pack_cluster_aabbs(tris: TriSoA, ck: int = CK):
    """[C, 8] f32 cluster AABB rows (minx,miny,minz,maxx,maxy,maxz,0,0) for
    CK-sized runs of the (BVH-DFS-ordered) triangle array.

    Pure jnp so it traces under jit (render_frame_fn takes the baked scene
    as a runtime argument — sharding replicates it); shapes are static from
    tris.v0.shape, XLA folds the whole thing into a few reduces."""
    v0 = tris.v0
    v1 = v0 + tris.e1
    v2 = v0 + tris.e2
    t = v0.shape[0]
    c = max(1, -(-t // ck))
    pad = c * ck - t
    big = jnp.full((pad, 3), jnp.inf, jnp.float32)

    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    lo = jnp.concatenate([lo, big]).reshape(c, ck, 3).min(axis=1)
    hi = jnp.concatenate([hi, -big]).reshape(c, ck, 3).max(axis=1)
    return jnp.concatenate([lo, hi, jnp.zeros((c, 2), jnp.float32)], axis=-1)


def pack_shaded_tris_cluster(tris: TriSoA, materials: MaterialArray,
                             ck: int = CK):
    """[C*ck, 48] shaded pack padded to a whole number of clusters."""
    from .pallas_lane import pack_shaded_tris_lane

    pack = pack_shaded_tris_lane(tris, materials)
    t_pad = _round_up(pack.shape[0], ck)
    if pack.shape[0] < t_pad:
        pack = jnp.pad(pack, ((0, t_pad - pack.shape[0]), (0, 0)))
    return pack


def pack_tris_cluster(tris: TriSoA, ck: int = CK):
    """[C*ck, 16] Baldwin-Weber pack padded to a whole number of clusters."""
    from .pallas_lane import pack_tris_lane

    pack = pack_tris_lane(tris)
    t_pad = _round_up(pack.shape[0], ck)
    if pack.shape[0] < t_pad:
        pack = jnp.pad(pack, ((0, t_pad - pack.shape[0]), (0, 0)))
    return pack


PROXY_P = 512  # proxy triangles seeding best_t before cluster culling


def pack_proxy_tris(tris: TriSoA, p: int = PROXY_P):
    """[P, 16] Baldwin-Weber pack of the p largest-area triangles, with the
    triangle's GLOBAL id stashed in column 12 (f32; exact below 2^24).

    Closest-hit kernels test this block dense FIRST: in interior scenes most
    rays hit a wall/floor/ceiling, so ~5% extra pair work seeds best_t with a
    real hit distance and the per-cluster slab culling then rejects clusters
    beyond the hit even for fully divergent wavefronts — the cases where
    per-cell AABB culling otherwise degenerates to brute force.  This is the
    vectorized stand-in for DXR's per-ray ordered traversal early-out
    (RtScene.cpp:220-308 hardware TLAS)."""
    from .pallas_lane import pack_tris_lane

    t = int(tris.v0.shape[0])
    p = min(_round_up(p, 8), _round_up(t, 8))
    n = jnp.cross(tris.e1, tris.e2)
    area2 = jnp.sum(n * n, axis=-1)
    k = min(p, t)
    _, idx = jax.lax.top_k(area2, k)
    idx = idx.astype(jnp.int32)
    sub = TriSoA(
        v0=tris.v0[idx], e1=tris.e1[idx], e2=tris.e2[idx],
        n0=tris.n0[idx], n1=tris.n1[idx], n2=tris.n2[idx],
        uv0=tris.uv0[idx], uv1=tris.uv1[idx], uv2=tris.uv2[idx],
        material_id=tris.material_id[idx],
    )
    pack = pack_tris_lane(sub)[:p]
    ids = jnp.full((p,), -1.0, jnp.float32).at[:k].set(idx.astype(jnp.float32))
    return pack.at[:, 12].set(ids)


def _proxy_seed(proxy_ref, o, d, tmin, cull_backface, bt_ref, bid_ref):
    """Dense pair test of the proxy block, updating (bt, bid) in place.

    Winner ids come from pack column 12 (global ids), so a proxy win is a
    REAL answer: the main loop only overwrites it when strictly closer, and
    the attribute refetch finds the winner's cluster by id range."""
    p = proxy_ref.shape[0]
    for start in range(0, p, CK):
        size = min(CK, p - start)
        blk = proxy_ref[pl.ds(start, size), :]
        id_tile = jnp.broadcast_to(blk[:, 12:13], (size, LANE))
        in_scene = id_tile >= 0.0
        for s in range(tmin.shape[0]):
            best_t = bt_ref[s:s + 1, :]
            valid, t = _pair_test_block(
                blk,
                o[0][s:s + 1], o[1][s:s + 1], o[2][s:s + 1],
                d[0][s:s + 1], d[1][s:s + 1], d[2][s:s + 1],
                tmin[s:s + 1], best_t, cull_backface,
            )
            valid = valid & in_scene
            t_m = jnp.where(valid, t, _BIG)
            col_min = jnp.min(t_m, axis=0, keepdims=True)
            improved = col_min < best_t
            is_min = (t_m == col_min) & valid
            ids_m = jnp.where(is_min, id_tile, 2e9)
            new_id = jnp.min(ids_m, axis=0, keepdims=True)
            bid_ref[s:s + 1, :] = jnp.where(
                improved, new_id.astype(jnp.int32), bid_ref[s:s + 1, :]
            )
            bt_ref[s:s + 1, :] = jnp.where(improved, col_min, best_t)


def pack_tris_cluster_hbm(tris: TriSoA, ck: int = CK):
    """[C*ck, 128] pack for the HBM-paged tier: Mosaic DMA slices must be
    lane-aligned (128), so the 16 Baldwin-Weber columns are padded to a
    full lane tile (512 B/tri in HBM — bandwidth is not the bottleneck,
    the per-cluster DMA latency is)."""
    pack = pack_tris_cluster(tris, ck)
    return jnp.pad(pack, ((0, 0), (0, 128 - pack.shape[1])))


def cell_cluster_shortlist(rows, aabbs, n_cells: int,
                           directional: bool = False):
    """Per-cell cluster shortlist: (order [cells,1,C] int32,
    ngroups [cells,1,1] int32, entry [cells,1,C] f32).

    `order` front-lists the clusters some live ray in the cell EXACTLY
    slab-overlaps, sorted front-to-back by `entry` (see below); `ngroups`
    = ceil(count / G) bounds the kernel's group loop.  The in-kernel
    per-cluster slab test used to be the only cull, which made every cell
    scan all C clusters' groups — measured ~1.5 us of vector->scalar sync
    per group, a ~30 us/cell floor at pink_room's 165 clusters
    (benchmarks/pink_micro.py).  Hoisting the cull into XLA prep makes the
    loop bound per-cell tight.

    The per-ray test mirrors the kernel's own slab test (_slab_tiles):
    inv(d) with the +-2e12 exact-zero sentinels, overlap iff
    near <= far, far >= tmin, near <= tmax, on live lanes only (tmax >
    tmin excludes rays_to_rows padding and alpha-restart inert lanes).
    An earlier bundle-interval-arithmetic version was ~2.4x looser on
    direction-sorted bounce wavefronts (114 vs 47 visits/cell,
    benchmarks/consv_gap) because divergent origins inflate the interval
    products; the exact union is a straight [rays, C] vector computation
    XLA fuses into the reductions, so tightness is nearly free.

    `entry[pos]` = min over overlapping live rays of max(per-ray slab
    entry, per-ray tmin) for the cluster at `order[pos]` — a LOWER bound
    on the t of any hit that cluster can produce for any lane, ascending
    in `pos`.  The closest-hit kernels early-exit once every lane's
    min(best_t, tmax) beats the next position's entry (exact, not
    heuristic): rays that don't overlap a cluster take nothing from it,
    and rays that do can only find t >= entry.  This is the wavefront
    analogue of ordered BVH traversal termination, which the reference
    gets from DXR hardware (TraceRay, RtScene.cpp:220-308)."""
    c = aabbs.shape[0]
    big = jnp.float32(_BIG)
    f = rows.reshape(8, n_cells, -1)                    # [8, cells, S*LANE]
    live = f[7] > f[6]

    def inv(dk):  # _ray_tiles' inv, elementwise per ray
        return jnp.where(
            jnp.abs(dk) > 1e-12,
            1.0 / jnp.where(jnp.abs(dk) > 1e-12, dk, 1.0),
            jnp.where(dk >= 0, 2e12, -2e12),
        )

    o = [f[k][:, :, None] for k in range(3)]            # [cells, SL, 1]
    iv = [inv(f[k + 3])[:, :, None] for k in range(3)]
    tmin = f[6][:, :, None]
    tmax = f[7][:, :, None]
    finite = jnp.isfinite(aabbs[:, 0])                  # all-pad clusters

    # chunk the cluster axis so the fused [cells, SL, chunk] intermediates
    # stay reduction-fused (never materialising [rays, C] f32)
    chunk = 32
    ov_chunks, en_chunks = [], []
    for c0 in range(0, c, chunk):
        cw = min(chunk, c - c0)
        blo = aabbs[c0:c0 + cw, 0:3]                    # [cw, 3]
        bhi = aabbs[c0:c0 + cw, 3:6]
        near = jnp.full((n_cells, f.shape[2], cw), -big)
        far = jnp.full((n_cells, f.shape[2], cw), big)
        for k in range(3):
            t0 = (blo[None, None, :, k] - o[k]) * iv[k]
            t1 = (bhi[None, None, :, k] - o[k]) * iv[k]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        ov = (near <= far) & (far >= tmin) & (near <= tmax) & live[:, :, None]
        ov = ov & finite[None, None, c0:c0 + cw]
        entry = jnp.where(ov, jnp.maximum(near, tmin), big)
        ov_chunks.append(jnp.any(ov, axis=1))           # [cells, cw]
        en_chunks.append(jnp.min(entry, axis=1))        # [cells, cw]
    overlap = jnp.concatenate(ov_chunks, axis=1)        # [cells, C]
    entry_key = jnp.concatenate(en_chunks, axis=1)

    del directional  # exact-entry order subsumes both old heuristics
    key = jnp.where(overlap, entry_key, big)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(key, order, axis=1)
    count = overlap.sum(axis=1).astype(jnp.int32)
    ngroups = -(-count // G)
    # [cells, 1, *]: SMEM blocks must match the array's trailing two dims
    return (order[:, None, :], ngroups[:, None, None],
            entry_sorted[:, None, :])


# ----------------------------------------------------------------- kernels
def _ray_tiles(r_ref):
    """Load the 8 ray-field rows as [rows, 128] tiles.

    r_ref block is [8, 1, rows, LANE]: the launchers reshape the flat
    [8, n_cols, LANE] field table to [8, n_cols//rows, rows, LANE] so the
    block's LAST TWO dims equal the array's — Mosaic requires last-two
    block dims divisible by (8, 128) or exactly equal, and sub-cell rows
    (cell_rows() < 8) would otherwise be an illegal (8, rows, 128) block."""
    ox, oy, oz = r_ref[0, 0], r_ref[1, 0], r_ref[2, 0]
    dx, dy, dz = r_ref[3, 0], r_ref[4, 0], r_ref[5, 0]
    tmin, tmax = r_ref[6, 0], r_ref[7, 0]
    inv = lambda d: jnp.where(  # noqa: E731
        jnp.abs(d) > 1e-12, 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1.0),
        jnp.where(d >= 0, 2e12, -2e12),
    )
    return (ox, oy, oz), (dx, dy, dz), (inv(dx), inv(dy), inv(dz)), tmin, tmax


def _slab_tiles(aabb_ref, c, o, inv_d, tmin, tmax):
    """[S,128] cluster-AABB overlap test against per-lane [tmin, tmax)."""
    ts = []
    for k in range(3):
        t0 = (aabb_ref[c, k] - o[k]) * inv_d[k]
        t1 = (aabb_ref[c, k + 3] - o[k]) * inv_d[k]
        ts.append((jnp.minimum(t0, t1), jnp.maximum(t0, t1)))
    t_enter = jnp.maximum(jnp.maximum(ts[0][0], ts[1][0]), ts[2][0])
    t_exit = jnp.minimum(jnp.minimum(ts[0][1], ts[1][1]), ts[2][1])
    return (t_enter <= t_exit) & (t_exit >= tmin) & (t_enter <= tmax)


def _pick_g() -> int:
    """Clusters per culling group (one scalar branch per group).  G=16
    measured WORSE across the board on pink_room at ck=64 (primary
    38.9->42.0, bounce 117->125, any-hit 3-stack 77.5->88.2 ms/1M, v5e):
    beyond G=8 the extra always-executed slab work outweighs the halved
    group branches.  G=4 measured in-frame round 4 (see BASELINE.md).
    FYP_G overrides for experiments."""
    import os

    v = int(os.environ.get("FYP_G", "8"))
    if not 1 <= v <= 64:
        # G <= 0 would silently build empty per-group scratch/semaphore
        # lists and fail later with an opaque trace-time error
        raise ValueError(f"FYP_G={v} must be in [1, 64]")
    return v


G = _pick_g()


def _or_reduce_bits(mask):
    """[S, LANE] i32 per-lane bitmask -> ONE scalar holding the OR of every
    lane: sublane halving joins, then log2(LANE) lane rotations
    (pltpu.roll).  All pure vector work until the single element read, so
    extracting G per-cluster predicates costs one vector->scalar sync
    instead of G."""
    m = mask
    s = m.shape[0]
    while s > 1:
        s //= 2
        m = m[:s] | m[s:2 * s]
    sh = LANE // 2
    while sh >= 1:
        m = m | pltpu.roll(m, sh, 1)
        sh //= 2
    return m[0, 0]


def _cull_mode() -> str:
    """FYP_CULL_MODE experiment override for the closest-path kernels:
    'bits' (default) | 'group' | 'none' — see _closest_body."""
    import os

    return os.environ.get("FYP_CULL_MODE", "bits")


def _group_overlaps(order_ref, aabb_ref, g, o, inv_d, tmin, tmax, n_clusters):
    """Slab-test the G ordered clusters of group g in one vector pass.

    Returns (cluster ids [G], bits scalar: bit j set iff some lane overlaps
    cluster j).  Folding all G overlap masks into one per-lane bitmask and
    OR-reducing it (_or_reduce_bits) leaves ONE vector->scalar sync per
    group; per-cluster predicates are scalar bit tests.  (Row-resolution
    gating was tried and REGRESSED ~10-50%: within a dirq-sorted cell the
    8 sublane rows are near-identical ray distributions — the sort makes
    coherence vary BETWEEN cells, not within — so per-row branches skip
    almost nothing and their overhead is pure loss.)"""
    cs = []
    mask = None
    for j in range(G):
        idx = g * G + j
        in_range = idx < n_clusters          # traced bool (grid-static g)
        c_j = order_ref[0, 0, jnp.minimum(idx, n_clusters - 1)]
        ov = _slab_tiles(aabb_ref, c_j, o, inv_d, tmin, tmax)
        ov = ov & in_range
        cs.append(c_j)
        bit = ov.astype(jnp.int32) << j
        mask = bit if mask is None else (mask | bit)
    return cs, _or_reduce_bits(mask)


def _pair_test_block(blk, ox, oy, oz, dx, dy, dz, tmin, tmax, cull_backface):
    """[ck, 128] Baldwin-Weber test of one loaded triangle block against one
    lane-row of rays (value-typed twin of pallas_lane._pair_test)."""
    from .pallas_lane import MXU_PAIR, _bw_pair_mxu

    if MXU_PAIR:
        return _bw_pair_mxu(blk[:, 0:16], (ox, oy, oz), (dx, dy, dz),
                            tmin, tmax, cull_backface)
    col = lambda k: blk[:, k:k + 1]  # noqa: E731
    nx, ny, nz, nv0 = col(0), col(1), col(2), col(3)
    ndir = nx * dx + ny * dy + nz * dz
    if cull_backface:
        dir_ok = ndir < -1e-9
    else:
        dir_ok = jnp.abs(ndir) > 1e-9
    t = (nv0 - (nx * ox + ny * oy + nz * oz)) / jnp.where(dir_ok, ndir, 1.0)
    r1x, r1y, r1z, r1v0 = col(4), col(5), col(6), col(7)
    u = (r1x * ox + r1y * oy + r1z * oz - r1v0) + t * (
        r1x * dx + r1y * dy + r1z * dz
    )
    r2x, r2y, r2z, r2v0 = col(8), col(9), col(10), col(11)
    v = (r2x * ox + r2y * oy + r2z * oz - r2v0) + t * (
        r2x * dx + r2y * dy + r2z * dz
    )
    valid = (
        dir_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    return valid, t


def _occl_accumulate(blk, c, ck, n_tris, o, d, tmin, tmax, occ_ref):
    """Accumulate any-hit counts for one loaded cluster block."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (blk.shape[0], LANE), 0)
    in_scene = (sub + c * ck) < n_tris
    hits = []
    for s in range(tmin.shape[0]):
        valid, _t = _pair_test_block(
            blk,
            o[0][s:s + 1], o[1][s:s + 1], o[2][s:s + 1],
            d[0][s:s + 1], d[1][s:s + 1], d[2][s:s + 1],
            tmin[s:s + 1], tmax[s:s + 1], False,
        )
        valid = valid & in_scene
        hits.append(jnp.sum(valid.astype(jnp.float32), axis=0, keepdims=True))
    occ_ref[...] = occ_ref[...] + jnp.concatenate(hits, axis=0)


def _closest_update(blk, c, ck, n_tris, o, d, tmin, cull_backface,
                    bt_ref, bid_ref):
    """Winner update for one loaded cluster block (inline selection)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (blk.shape[0], LANE), 0)
    sub_f = sub.astype(jnp.float32)
    tri_ids = sub + c * ck
    in_scene = tri_ids < n_tris
    for s in range(tmin.shape[0]):
        best_t = bt_ref[s:s + 1, :]
        valid, t = _pair_test_block(
            blk,
            o[0][s:s + 1], o[1][s:s + 1], o[2][s:s + 1],
            d[0][s:s + 1], d[1][s:s + 1], d[2][s:s + 1],
            tmin[s:s + 1], best_t, cull_backface,
        )
        valid = valid & in_scene
        t_m = jnp.where(valid, t, _BIG)
        col_min = jnp.min(t_m, axis=0, keepdims=True)
        improved = col_min < best_t
        is_min = (t_m == col_min) & valid
        first = jnp.min(jnp.where(is_min, sub_f, 1e9), axis=0, keepdims=True)
        pick = (sub_f == first) & is_min
        new_id = jnp.sum(jnp.where(pick, tri_ids, 0), axis=0, keepdims=True)
        bid_ref[s:s + 1, :] = jnp.where(improved, new_id, bid_ref[s:s + 1, :])
        bt_ref[s:s + 1, :] = jnp.where(improved, col_min, best_t)


def _bary_fetch(blk12, c, ck, bid, fet_ref):
    """Accumulate winner BW rows (one-hot MXU) for one loaded cluster."""
    in_c = (bid >= c * ck) & (bid < (c + 1) * ck)
    sub = jax.lax.broadcasted_iota(jnp.int32, (blk12.shape[0], LANE), 0)
    for s in range(bid.shape[0]):
        local = bid[s:s + 1, :] - c * ck
        pick = ((sub == local) & in_c[s:s + 1, :]).astype(jnp.float32)
        fet_ref[s] = fet_ref[s] + jax.lax.dot_general(
            blk12, pick, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _cluster_occlusion_kernel(
    r_ref, aabb_ref, order_ref, ng_ref, entry_ref, tri_ref, out_ref, occ_ref,
    *, n_clusters, ck, n_tris
):
    del entry_ref  # any-hit has no best_t to compare entries against
    o, d, inv_d, tmin, tmax = _ray_tiles(r_ref)
    occ_ref[...] = jnp.zeros((tmin.shape[0], LANE), jnp.float32)

    def body(g):
        open_ = occ_ref[...] == 0.0
        cs, bits = _group_overlaps(
            order_ref, aabb_ref, g, o, inv_d, tmin,
            jnp.where(open_, tmax, -_BIG), n_clusters,
        )

        @pl.when(bits != 0)
        def _():
            for j in range(G):
                c = cs[j]

                @pl.when(((bits >> j) & 1) != 0)
                def _():
                    blk = tri_ref[pl.ds(c * ck, ck), :]
                    _occl_accumulate(
                        blk, c, ck, n_tris, o, d, tmin, tmax, occ_ref,
                    )

        return g + 1

    # loop only the groups holding this cell's conservative shortlist
    # (cell_cluster_shortlist); entries past the count slab-cull in-kernel.
    # Early exit once every lane with a non-empty interval is occluded —
    # the entry-sorted order puts near occluders first, so saturated cells
    # stop paying the per-group predicate sync.
    ng = ng_ref[0, 0, 0]

    def keep_going(g):
        open_ = (occ_ref[...] == 0.0) & (tmax > tmin)
        return (g < ng) & jnp.any(open_)

    jax.lax.while_loop(keep_going, body, 0)
    out_ref[0] = occ_ref[...]


def _cluster_occlusion_hbm_kernel(
    r_ref, aabb_ref, order_ref, ng_ref, tri_hbm, out_ref, occ_ref, *bufs,
    n_clusters, ck, n_tris
):
    """Any-hit with the triangle pack resident in HBM.

    Grouped demand paging: G shortlisted clusters share one vector slab
    pass + one scalar branch (see _group_overlaps — the per-cluster scalar
    sync is the dominant cost of the naive loop), and a surviving group
    issues ALL its cluster DMAs back-to-back into per-slot VMEM buffers
    before the first wait, so transfer j+1..G overlaps pair-test j.  The
    loop is bounded by the cell's exact shortlist (cell_cluster_shortlist)
    — in this tier a culled group saves the DMAs too — and exits once every
    live lane is occluded."""
    blks, sems = bufs[:G], bufs[G:]
    o, d, inv_d, tmin, tmax = _ray_tiles(r_ref)
    occ_ref[...] = jnp.zeros((tmin.shape[0], LANE), jnp.float32)

    def body(g):
        open_ = occ_ref[...] == 0.0
        cs, bits = _group_overlaps(
            order_ref, aabb_ref, g, o, inv_d, tmin,
            jnp.where(open_, tmax, -_BIG), n_clusters,
        )

        @pl.when(bits != 0)
        def _():
            for j in range(G):
                @pl.when(((bits >> j) & 1) != 0)
                def _(j=j):
                    pltpu.make_async_copy(
                        tri_hbm.at[pl.ds(cs[j] * ck, ck), :], blks[j], sems[j]
                    ).start()
            for j in range(G):
                @pl.when(((bits >> j) & 1) != 0)
                def _(j=j):
                    pltpu.make_async_copy(
                        tri_hbm.at[pl.ds(cs[j] * ck, ck), :], blks[j], sems[j]
                    ).wait()
                    _occl_accumulate(
                        blks[j][...], cs[j], ck, n_tris, o, d, tmin, tmax,
                        occ_ref,
                    )

        return g + 1

    ng = ng_ref[0, 0, 0]

    def keep_going(g):
        open_ = (occ_ref[...] == 0.0) & (tmax > tmin)
        return (g < ng) & jnp.any(open_)

    jax.lax.while_loop(keep_going, body, 0)
    out_ref[0] = occ_ref[...]


def _cluster_closest_hbm_kernel(
    r_ref, aabb_ref, order_ref, ng_ref, entry_ref, tri_hbm, *rest,
    n_clusters, ck, n_tris, cull_backface, use_proxy=False,
):
    """Lean closest-hit with HBM-resident triangles.

    Nearest-first order (cell_cluster_order) tightens best_t early; grouped
    slab culling (see _group_overlaps) pays one scalar branch per G
    clusters; a surviving group's DMAs are all in flight before the first
    pair test (intra-group pipelining).  Prefetch predicates use best_t at
    group entry — conservative but correct.  With use_proxy, a VMEM-resident
    proxy block (pack_proxy_tris) seeds best_t dense before any DMA — in the
    HBM tier a culled cluster saves the transfer too."""
    if use_proxy:
        proxy_ref, out_ref, bt_ref, bid_ref, fet_ref, *bufs = rest
    else:
        proxy_ref = None
        out_ref, bt_ref, bid_ref, fet_ref, *bufs = rest
    blks, sems = bufs[:G], bufs[G:]
    o, d, inv_d, tmin, tmax = _ray_tiles(r_ref)
    bt_ref[...] = tmax
    bid_ref[...] = jnp.full((tmin.shape[0], LANE), -1, jnp.int32)
    if use_proxy:
        _proxy_seed(proxy_ref, o, d, tmin, cull_backface, bt_ref, bid_ref)

    def body(g):
        best = bt_ref[...]
        cs, bits = _group_overlaps(
            order_ref, aabb_ref, g, o, inv_d, tmin, best, n_clusters
        )

        @pl.when(bits != 0)
        def _():
            for j in range(G):
                @pl.when(((bits >> j) & 1) != 0)
                def _(j=j):
                    pltpu.make_async_copy(
                        tri_hbm.at[pl.ds(cs[j] * ck, ck), :], blks[j], sems[j]
                    ).start()
            for j in range(G):
                @pl.when(((bits >> j) & 1) != 0)
                def _(j=j):
                    pltpu.make_async_copy(
                        tri_hbm.at[pl.ds(cs[j] * ck, ck), :], blks[j], sems[j]
                    ).wait()
                    _closest_update(
                        blks[j][...], cs[j], ck, n_tris, o, d, tmin,
                        cull_backface, bt_ref, bid_ref,
                    )

        return g + 1

    ng = ng_ref[0, 0, 0]

    def keep_going(g):
        # see _cluster_closest_kernel: sorted conservative entries make the
        # front-to-back exit exact; here each skipped group saves G DMAs too
        bound = jnp.where(tmax > tmin, jnp.minimum(bt_ref[...], tmax), 0.0)
        nxt = entry_ref[0, 0, jnp.minimum(g * G, n_clusters - 1)]
        return (g < ng) & (nxt <= jnp.max(bound))

    jax.lax.while_loop(keep_going, body, 0)

    bid = bid_ref[...]
    t_ = bt_ref[...]
    fet_ref[...] = jnp.zeros((tmin.shape[0], 12, LANE), jnp.float32)

    def fetch(g, _):
        in_g = (bid >= g * G * ck) & (bid < (g + 1) * G * ck)
        g_any = jnp.sum(in_g.astype(jnp.float32)) > 0.0

        @pl.when(g_any)
        def _():
            for j in range(G):
                c = g * G + j
                in_c = (bid >= c * ck) & (bid < (c + 1) * ck)
                pred = jnp.sum(in_c.astype(jnp.float32)) > 0.0

                @pl.when(pred)
                def _():
                    cp = pltpu.make_async_copy(
                        tri_hbm.at[pl.ds(c * ck, ck), :], blks[0], sems[0]
                    )
                    cp.start()
                    cp.wait()
                    _bary_fetch(blks[0][:, 0:12], c, ck, bid, fet_ref)

        return 0

    jax.lax.fori_loop(0, -(-n_clusters // G), fetch, 0)

    def attr(k):
        return jnp.concatenate(
            [fet_ref[s, k:k + 1, :] for s in range(tmin.shape[0])], axis=0
        )

    ox, oy, oz = o
    dx, dy, dz = d
    u_acc = (attr(4) * ox + attr(5) * oy + attr(6) * oz - attr(7)) + t_ * (
        attr(4) * dx + attr(5) * dy + attr(6) * dz
    )
    v_acc = (attr(8) * ox + attr(9) * oy + attr(10) * oz - attr(11)) + t_ * (
        attr(8) * dx + attr(9) * dy + attr(10) * dz
    )
    hit_f = (bid >= 0).astype(jnp.float32)
    out_ref[0, 0] = t_
    out_ref[1, 0] = bid.astype(jnp.float32)
    out_ref[2, 0] = u_acc * hit_f
    out_ref[3, 0] = v_acc * hit_f


def _shortlist_fetch_loop(order_ref, ng, ck, n_clusters, bid, visit):
    """Winner-attribute fetch over shortlisted clusters only.

    `visit(c, in_c)` runs the per-cluster fetch; winners can only live in
    clusters the body loop visited (proxy seeds are real hits, whose
    clusters the conservative shortlist necessarily contains), so the same
    ng bound applies.  The in_range guard matters for correctness here:
    clamped duplicate reads past the shortlist would double-accumulate a
    winner's one-hot fetch."""
    def fetch(g, _):
        cs, masks = [], []
        mask = None
        for j in range(G):
            idx = g * G + j
            in_range = idx < n_clusters
            c_j = order_ref[0, 0, jnp.minimum(idx, n_clusters - 1)]
            in_c = (bid >= c_j * ck) & (bid < (c_j + 1) * ck) & in_range
            cs.append(c_j)
            masks.append(in_c)
            bit = in_c.astype(jnp.int32) << j
            mask = bit if mask is None else (mask | bit)
        bits = _or_reduce_bits(mask)

        @pl.when(bits != 0)
        def _():
            for j in range(G):
                @pl.when(((bits >> j) & 1) != 0)
                def _(j=j):
                    visit(cs[j], masks[j])

        return 0

    jax.lax.fori_loop(0, ng, fetch, 0)



def _closest_body(mode, order_ref, aabb_ref, o, d, inv_d, tmin, n_clusters,
                  ck, n_tris, cull_backface, tri_ref, bt_ref, bid_ref):
    """One shortlist-group step of a closest-path kernel, under one of three
    culling disciplines (FYP_CULL_MODE experiment; 'bits' is default):
      'bits'  — vector slab pass per group, one scalar sync for the OR-
                reduced bitmask, per-cluster pl.when (skips pair tests
                against the CURRENT best_t);
      'group' — the group-level bitmask sync only; a surviving group pair-
                tests all G clusters unconditionally;
      'none'  — no slab predicates at all: the entry-ordered while_loop
                exit is the only cull.  With exact shortlists most
                positions pass the slab test anyway, so the per-cluster
                scalar syncs (~1.5 us each) can exceed the pair tests they
                skip (~0.9 us/cluster at ck=64)."""
    def body(g):
        best = bt_ref[...]
        if mode == "none":
            for j in range(G):
                idx = jnp.minimum(g * G + j, n_clusters - 1)
                c = order_ref[0, 0, idx]
                _closest_update(
                    tri_ref[pl.ds(c * ck, ck), :], c, ck, n_tris, o, d,
                    tmin, cull_backface, bt_ref, bid_ref,
                )
            return g + 1
        cs, bits = _group_overlaps(
            order_ref, aabb_ref, g, o, inv_d, tmin, best, n_clusters
        )

        @pl.when(bits != 0)
        def _():
            for j in range(G):
                c = cs[j]
                if mode == "group":
                    _closest_update(
                        tri_ref[pl.ds(c * ck, ck), :], c, ck, n_tris, o, d,
                        tmin, cull_backface, bt_ref, bid_ref,
                    )
                else:
                    @pl.when(((bits >> j) & 1) != 0)
                    def _(c=c):
                        _closest_update(
                            tri_ref[pl.ds(c * ck, ck), :], c, ck, n_tris,
                            o, d, tmin, cull_backface, bt_ref, bid_ref,
                        )

        return g + 1

    return body

def _cluster_shaded_kernel(
    r_ref, aabb_ref, order_ref, ng_ref, entry_ref, tri_ref, *rest,
    n_clusters, ck, n_tris, cull_backface, use_proxy=False,
    cull_mode="bits",
):
    if use_proxy:
        proxy_ref, out_ref, bt_ref, bid_ref, fet_ref = rest
    else:
        proxy_ref = None
        out_ref, bt_ref, bid_ref, fet_ref = rest
    o, d, inv_d, tmin, tmax = _ray_tiles(r_ref)
    bt_ref[...] = tmax
    bid_ref[...] = jnp.full((tmin.shape[0], LANE), -1, jnp.int32)
    if use_proxy:
        _proxy_seed(proxy_ref, o, d, tmin, cull_backface, bt_ref, bid_ref)

    body = _closest_body(
        cull_mode, order_ref, aabb_ref, o, d, inv_d, tmin, n_clusters,
        ck, n_tris, cull_backface, tri_ref, bt_ref, bid_ref,
    )

    ng = ng_ref[0, 0, 0]

    def keep_going(g):
        # exact early exit: positions >= g*G have conservative entry >=
        # entry_ref[g*G], a LOWER bound on every live lane's per-ray slab
        # entry — once every lane's improvement bound beats it, later
        # clusters cannot improve.  A lane's bound is min(best_t, tmax)
        # (hits beyond tmax never count); empty-interval lanes (inert
        # alpha restarts, rays_to_rows padding) are excluded.
        bound = jnp.where(tmax > tmin, jnp.minimum(bt_ref[...], tmax), 0.0)
        nxt = entry_ref[0, 0, jnp.minimum(g * G, n_clusters - 1)]
        return (g < ng) & (nxt <= jnp.max(bound))

    jax.lax.while_loop(keep_going, body, 0)

    # winner-attribute fetch: only shortlisted clusters can own winners
    fet_ref[...] = jnp.zeros((tmin.shape[0], _ATTR_HI, LANE), jnp.float32)
    bid = bid_ref[...]

    def visit(c, in_c):
        blk = tri_ref[pl.ds(c * ck, ck), 0:_ATTR_HI]  # [ck, 45]
        sub = jax.lax.broadcasted_iota(jnp.int32, (ck, LANE), 0)
        for s in range(tmin.shape[0]):
            local = bid[s:s + 1, :] - c * ck
            pick = ((sub == local) & in_c[s:s + 1, :]).astype(jnp.float32)
            fet_ref[s] = fet_ref[s] + jax.lax.dot_general(
                blk, pick, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [45, 128]

    _shortlist_fetch_loop(order_ref, ng, ck, n_clusters, bid, visit)

    # ---- assemble the OUT_W field table (pallas_lane layout) ----
    t_ = bt_ref[...]
    id_ = bid.astype(jnp.float32)
    hit_f = (bid >= 0).astype(jnp.float32)

    def attr(k):  # [rows, 128] of fetched attr row k
        return jnp.concatenate(
            [fet_ref[s, k:k + 1, :] for s in range(tmin.shape[0])], axis=0
        )

    r1 = (attr(4), attr(5), attr(6))
    r2 = (attr(8), attr(9), attr(10))
    ox, oy, oz = o
    dx, dy, dz = d
    u_ = (r1[0] * ox + r1[1] * oy + r1[2] * oz - attr(7)) + t_ * (
        r1[0] * dx + r1[1] * dy + r1[2] * dz
    )
    v_ = (r2[0] * ox + r2[1] * oy + r2[2] * oz - attr(11)) + t_ * (
        r2[0] * dx + r2[1] * dy + r2[2] * dz
    )
    u_ = u_ * hit_f
    v_ = v_ * hit_f
    w_ = 1.0 - u_ - v_

    a = lambda k: attr(_ATTR_LO + k)  # noqa: E731
    nx = w_ * a(0) + u_ * a(3) + v_ * a(6)
    ny = w_ * a(1) + u_ * a(4) + v_ * a(7)
    nz = w_ * a(2) + u_ * a(5) + v_ * a(8)
    uvx = w_ * a(9) + u_ * a(11) + v_ * a(13)
    uvy = w_ * a(10) + u_ * a(12) + v_ * a(14)

    fields = [t_, id_, u_, v_, nx, ny, nz, uvx, uvy] + [
        a(k) for k in range(15, 33)
    ]
    while len(fields) < OUT_W:
        fields.append(jnp.zeros((tmin.shape[0], LANE), jnp.float32))
    for k, f_ in enumerate(fields):
        out_ref[k, 0] = f_


def _cluster_closest_kernel(
    r_ref, aabb_ref, order_ref, ng_ref, entry_ref, tri_ref, *rest,
    n_clusters, ck, n_tris, cull_backface, use_proxy=False,
    cull_mode="bits",
):
    """Lean closest-hit over the [T,16] Baldwin-Weber pack: outputs only
    (t, id, u, v) — shading attributes come from an XLA gather outside the
    kernel (ops.shading.prepare_shading_data), which keeps the VMEM
    footprint at 64 B/triangle and raises the cluster-path scene ceiling
    4x over the fused 192 B/triangle shaded pack."""
    if use_proxy:
        proxy_ref, out_ref, bt_ref, bid_ref, fet_ref = rest
    else:
        proxy_ref = None
        out_ref, bt_ref, bid_ref, fet_ref = rest
    o, d, inv_d, tmin, tmax = _ray_tiles(r_ref)
    bt_ref[...] = tmax
    bid_ref[...] = jnp.full((tmin.shape[0], LANE), -1, jnp.int32)
    if use_proxy:
        _proxy_seed(proxy_ref, o, d, tmin, cull_backface, bt_ref, bid_ref)

    body = _closest_body(
        cull_mode, order_ref, aabb_ref, o, d, inv_d, tmin, n_clusters,
        ck, n_tris, cull_backface, tri_ref, bt_ref, bid_ref,
    )

    ng = ng_ref[0, 0, 0]

    def keep_going(g):
        # exact early exit: positions >= g*G have conservative entry >=
        # entry_ref[g*G], a LOWER bound on every live lane's per-ray slab
        # entry — once every lane's improvement bound beats it, later
        # clusters cannot improve.  A lane's bound is min(best_t, tmax)
        # (hits beyond tmax never count); empty-interval lanes (inert
        # alpha restarts, rays_to_rows padding) are excluded.
        bound = jnp.where(tmax > tmin, jnp.minimum(bt_ref[...], tmax), 0.0)
        nxt = entry_ref[0, 0, jnp.minimum(g * G, n_clusters - 1)]
        return (g < ng) & (nxt <= jnp.max(bound))

    jax.lax.while_loop(keep_going, body, 0)

    # bary refetch: one-hot over shortlisted winner clusters (BW rows 4..11)
    bid = bid_ref[...]
    t_ = bt_ref[...]
    fet_ref[...] = jnp.zeros((tmin.shape[0], 12, LANE), jnp.float32)

    _shortlist_fetch_loop(
        order_ref, ng, ck, n_clusters, bid,
        lambda c, in_c: _bary_fetch(
            tri_ref[pl.ds(c * ck, ck), 0:12], c, ck, bid, fet_ref
        ),
    )

    def attr(k):
        return jnp.concatenate(
            [fet_ref[s, k:k + 1, :] for s in range(tmin.shape[0])], axis=0
        )

    ox, oy, oz = o
    dx, dy, dz = d
    u_acc = (attr(4) * ox + attr(5) * oy + attr(6) * oz - attr(7)) + t_ * (
        attr(4) * dx + attr(5) * dy + attr(6) * dz
    )
    v_acc = (attr(8) * ox + attr(9) * oy + attr(10) * oz - attr(11)) + t_ * (
        attr(8) * dx + attr(9) * dy + attr(10) * dz
    )
    hit_f = (bid >= 0).astype(jnp.float32)
    out_ref[0, 0] = t_
    out_ref[1, 0] = bid.astype(jnp.float32)
    out_ref[2, 0] = u_acc * hit_f
    out_ref[3, 0] = v_acc * hit_f


# ---------------------------------------------------------------- wrappers
@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "ck", "n_tris", "interpret", "directional",
                     "sub_rows"),
)
def _launch_cluster_occlusion(rows, aabbs, tri_pack, n_clusters, ck, n_tris,
                              interpret, directional=False, sub_rows=S):
    n_cols = rows.shape[1]
    sr = sub_rows
    n_cells = n_cols // sr
    order, ngroups, entry = cell_cluster_shortlist(
        rows, aabbs, n_cells, directional)
    # 4-D ray layout: block last-two dims must equal the array's (see
    # _ray_tiles docstring)
    rows4 = rows.reshape(8, n_cells, sr, LANE)
    out = pl.pallas_call(
        functools.partial(
            _cluster_occlusion_kernel,
            n_clusters=n_clusters, ck=ck, n_tris=n_tris,
        ),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((8, 1, sr, LANE), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(aabbs.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tri_pack.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sr, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, sr, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((sr, LANE), jnp.float32)],
        interpret=interpret,
    )(rows4, aabbs, order, ngroups, entry, tri_pack)
    return out.reshape(n_cols, LANE)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "ck", "n_tris", "cull_backface",
                     "interpret", "directional", "sub_rows"),
)
def _launch_cluster_shaded(rows, aabbs, tri_pack, n_clusters, ck, n_tris,
                           cull_backface, interpret, proxy=None,
                           directional=False, sub_rows=S):
    n_cols = rows.shape[1]
    sr = sub_rows
    n_cells = n_cols // sr
    order, ngroups, entry = cell_cluster_shortlist(
        rows, aabbs, n_cells, directional)
    rows4 = rows.reshape(8, n_cells, sr, LANE)  # see _ray_tiles docstring
    in_specs = [
        pl.BlockSpec((8, 1, sr, LANE), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(aabbs.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(tri_pack.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [rows4, aabbs, order, ngroups, entry, tri_pack]
    if proxy is not None:
        in_specs.append(pl.BlockSpec(proxy.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(proxy)
    out = pl.pallas_call(
        functools.partial(
            _cluster_shaded_kernel,
            n_clusters=n_clusters, ck=ck, n_tris=n_tris,
            cull_backface=cull_backface, use_proxy=proxy is not None,
            cull_mode=_cull_mode(),
        ),
        grid=(n_cells,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((OUT_W, 1, sr, LANE), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_W, n_cells, sr, LANE),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sr, LANE), jnp.float32),
            pltpu.VMEM((sr, LANE), jnp.int32),
            pltpu.VMEM((sr, _ATTR_HI, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return out.reshape(OUT_W, n_cols, LANE)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "ck", "n_tris", "cull_backface",
                     "interpret", "directional", "sub_rows"),
)
def _launch_cluster_closest(rows, aabbs, tri_pack, n_clusters, ck, n_tris,
                            cull_backface, interpret, proxy=None,
                            directional=False, sub_rows=S):
    n_cols = rows.shape[1]
    sr = sub_rows
    n_cells = n_cols // sr
    order, ngroups, entry = cell_cluster_shortlist(
        rows, aabbs, n_cells, directional)
    rows4 = rows.reshape(8, n_cells, sr, LANE)  # see _ray_tiles docstring
    in_specs = [
        pl.BlockSpec((8, 1, sr, LANE), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(aabbs.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(tri_pack.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [rows4, aabbs, order, ngroups, entry, tri_pack]
    if proxy is not None:
        in_specs.append(pl.BlockSpec(proxy.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(proxy)
    out = pl.pallas_call(
        functools.partial(
            _cluster_closest_kernel,
            n_clusters=n_clusters, ck=ck, n_tris=n_tris,
            cull_backface=cull_backface, use_proxy=proxy is not None,
            cull_mode=_cull_mode(),
        ),
        grid=(n_cells,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, 1, sr, LANE), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_cells, sr, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sr, LANE), jnp.float32),   # best_t
            pltpu.VMEM((sr, LANE), jnp.int32),     # winner tri id
            pltpu.VMEM((sr, 12, LANE), jnp.float32),  # BW winner rows
        ],
        interpret=interpret,
    )(*operands)
    return out.reshape(4, n_cols, LANE)


def intersect_closest_clusters(
    tris: TriSoA,
    origin,
    direction,
    t_min,
    t_max=None,
    cull_backface: bool = False,
    tri_pack=None,
    aabbs=None,
    ck: int = CK,
    interpret: bool | None = None,
    proxy_pack=None,
    directional: bool = False,
) -> HitRecord:
    """Closest-hit over the lean [T,16] pack (64 B/tri VMEM): the
    large-cluster tier.  Shading attributes come from XLA gathers outside
    (ops.shading.prepare_shading_data)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    if tri_pack is None:
        tri_pack = pack_tris_cluster(tris, ck)
    if aabbs is None:
        aabbs = pack_cluster_aabbs(tris, ck)
    out = _launch_cluster_closest(
        rows, aabbs, tri_pack, int(aabbs.shape[0]), ck,
        int(tris.v0.shape[0]), cull_backface, interpret, proxy=proxy_pack,
        directional=directional, sub_rows=cell_rows(),
    )
    flat = out.reshape(4, -1)[:, :n]
    tri = flat[1].astype(jnp.int32).reshape(shape)
    miss = tri < 0
    return HitRecord(
        t=jnp.where(miss, _BIG, flat[0].reshape(shape)),
        tri=tri,
        bary_u=flat[2].reshape(shape),
        bary_v=flat[3].reshape(shape),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "ck", "n_tris", "interpret", "directional"),
)
def _launch_cluster_occlusion_hbm(rows, aabbs, tri_pack, n_clusters, ck,
                                  n_tris, interpret, directional=False):
    n_cols = rows.shape[1]
    n_cells = n_cols // S
    order, ngroups, _ = cell_cluster_shortlist(
        rows, aabbs, n_cells, directional)
    rows4 = rows.reshape(8, n_cells, S, LANE)  # see _ray_tiles docstring
    out = pl.pallas_call(
        functools.partial(
            _cluster_occlusion_hbm_kernel,
            n_clusters=n_clusters, ck=ck, n_tris=n_tris,
        ),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((8, 1, S, LANE), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(aabbs.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # triangle pack stays in HBM
        ],
        out_specs=pl.BlockSpec((1, S, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, S, LANE), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((S, LANE), jnp.float32)]
            + [pltpu.VMEM((ck, 128), jnp.float32) for _ in range(G)]
            + [pltpu.SemaphoreType.DMA for _ in range(G)]
        ),
        interpret=interpret,
    )(rows4, aabbs, order, ngroups, tri_pack)
    return out.reshape(n_cols, LANE)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "ck", "n_tris", "cull_backface",
                     "interpret", "directional"),
)
def _launch_cluster_closest_hbm(rows, aabbs, tri_pack, n_clusters, ck,
                                n_tris, cull_backface, interpret, proxy=None,
                                directional=False):
    n_cols = rows.shape[1]
    n_cells = n_cols // S
    order, ngroups, entry = cell_cluster_shortlist(
        rows, aabbs, n_cells, directional)
    rows4 = rows.reshape(8, n_cells, S, LANE)  # see _ray_tiles docstring
    in_specs = [
        pl.BlockSpec((8, 1, S, LANE), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(aabbs.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_clusters), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # triangle pack stays in HBM
    ]
    operands = [rows4, aabbs, order, ngroups, entry, tri_pack]
    if proxy is not None:
        in_specs.append(pl.BlockSpec(proxy.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(proxy)
    out = pl.pallas_call(
        functools.partial(
            _cluster_closest_hbm_kernel,
            n_clusters=n_clusters, ck=ck, n_tris=n_tris,
            cull_backface=cull_backface, use_proxy=proxy is not None,
        ),
        grid=(n_cells,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, 1, S, LANE), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_cells, S, LANE), jnp.float32),
        scratch_shapes=(
            [
                pltpu.VMEM((S, LANE), jnp.float32),
                pltpu.VMEM((S, LANE), jnp.int32),
                pltpu.VMEM((S, 12, LANE), jnp.float32),
            ]
            + [pltpu.VMEM((ck, 128), jnp.float32) for _ in range(G)]
            + [pltpu.SemaphoreType.DMA for _ in range(G)]
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(4, n_cols, LANE)


def occluded_clusters_hbm(tris, origin, direction, t_min, t_max=None,
                          tri_pack=None, aabbs=None, ck: int = CK,
                          interpret: bool | None = None,
                          directional: bool = False):
    """Any-hit with HBM-resident triangles (the unbounded-scene tier)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    if tri_pack is None:
        tri_pack = pack_tris_cluster_hbm(tris, ck)
    if aabbs is None:
        aabbs = pack_cluster_aabbs(tris, ck)
    hits = _launch_cluster_occlusion_hbm(
        rows, aabbs, tri_pack, int(aabbs.shape[0]), ck,
        int(tris.v0.shape[0]), interpret, directional=directional,
    )
    return (hits.reshape(-1)[:n] > 0).reshape(shape)


def intersect_closest_clusters_hbm(
    tris: TriSoA,
    origin,
    direction,
    t_min,
    t_max=None,
    cull_backface: bool = False,
    tri_pack=None,
    aabbs=None,
    ck: int = CK,
    interpret: bool | None = None,
    proxy_pack=None,
    directional: bool = False,
) -> HitRecord:
    """Closest-hit with HBM-resident triangles (demand-paged clusters)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    if tri_pack is None:
        tri_pack = pack_tris_cluster_hbm(tris, ck)
    if aabbs is None:
        aabbs = pack_cluster_aabbs(tris, ck)
    out = _launch_cluster_closest_hbm(
        rows, aabbs, tri_pack, int(aabbs.shape[0]), ck,
        int(tris.v0.shape[0]), cull_backface, interpret, proxy=proxy_pack,
        directional=directional,
    )
    flat = out.reshape(4, -1)[:, :n]
    tri = flat[1].astype(jnp.int32).reshape(shape)
    miss = tri < 0
    return HitRecord(
        t=jnp.where(miss, _BIG, flat[0].reshape(shape)),
        tri=tri,
        bary_u=flat[2].reshape(shape),
        bary_v=flat[3].reshape(shape),
    )


def occluded_clusters(tris, origin, direction, t_min, t_max=None,
                      tri_pack=None, aabbs=None, ck: int = CK,
                      interpret: bool | None = None,
                      directional: bool = False):
    """Boolean any-hit query via the clustered kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    if tri_pack is None:
        tri_pack = pack_tris_cluster(tris, ck)
    if aabbs is None:
        aabbs = pack_cluster_aabbs(tris, ck)
    hits = _launch_cluster_occlusion(
        rows, aabbs, tri_pack, int(aabbs.shape[0]), ck,
        int(tris.v0.shape[0]), interpret, directional=directional,
        sub_rows=cell_rows(),
    )
    return (hits.reshape(-1)[:n] > 0).reshape(shape)


def intersect_shaded_clusters(
    tris: TriSoA,
    tri_pack,
    aabbs,
    origin,
    direction,
    t_min,
    t_max=None,
    cull_backface: bool = False,
    ck: int = CK,
    interpret: bool | None = None,
    proxy_pack=None,
    directional: bool = False,
):
    """Returns (HitRecord, fields [..., OUT_W]) like pallas_lane/shaded."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    out = _launch_cluster_shaded(
        rows, aabbs, tri_pack, int(aabbs.shape[0]), ck,
        int(tris.v0.shape[0]), cull_backface, interpret, proxy=proxy_pack,
        directional=directional, sub_rows=cell_rows(),
    )
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


def intersect_shaded_clusters_fm(
    tris: TriSoA,
    tri_pack,
    aabbs,
    origin,
    direction,
    t_min,
    t_max=None,
    cull_backface: bool = False,
    ck: int = CK,
    interpret: bool | None = None,
    proxy_pack=None,
    directional: bool = False,
):
    """Field-major variant of intersect_shaded_clusters: returns
    (HitRecord, fields_fm [OUT_W, ...shape]) without the [N, OUT_W]
    transpose (a real XLA copy, ~15 ms per 1M rays on v5e — see
    benchmarks/shade_micro.py).  Decode with
    ops.shading.shading_from_fields_fm."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    rows, n, n_cols = rays_to_rows(origin, direction, t_min, t_max, shape)
    out = _launch_cluster_shaded(
        rows, aabbs, tri_pack, int(aabbs.shape[0]), ck,
        int(tris.v0.shape[0]), cull_backface, interpret, proxy=proxy_pack,
        directional=directional, sub_rows=cell_rows(),
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
