"""Shortlist-granularity statistics: per-cell (1024-ray) vs per-lane-row
(128-ray) exact cluster overlap counts on a REAL sorted pink_room bounce
wavefront.  Decides whether a per-row-shortlist closest kernel is worth
building: pair-test work scales with sum(row visits) * 128 vs
cell_visits * 1024.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/rowlist_stats.py
"""
import jax
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
from fyp_bidirectionalpathtracer_tpu.accel.pallas_lane import LANE, S, rays_to_rows
from fyp_bidirectionalpathtracer_tpu.models.pink_room import pink_room
from fyp_bidirectionalpathtracer_tpu.ops.raysort import (
    ray_sort_keys_dirq,
    scene_bounds,
)
from fyp_bidirectionalpathtracer_tpu.scene.camera import camera_ray_dirs
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene

W, H = 1280, 720


def overlap_counts(rows, aabbs, n_cells):
    """Exact per-(cell,row) and per-cell overlap counts (the
    cell_cluster_shortlist slab math, reduced per row instead of per cell)."""
    c = aabbs.shape[0]
    big = jnp.float32(1e30)
    f = rows.reshape(8, n_cells, S, LANE)      # [8, cells, S, 128]
    live = f[7] > f[6]

    def inv(dk):
        return jnp.where(
            jnp.abs(dk) > 1e-12,
            1.0 / jnp.where(jnp.abs(dk) > 1e-12, dk, 1.0),
            jnp.where(dk >= 0, 2e12, -2e12),
        )

    o = [f[k][..., None] for k in range(3)]
    iv = [inv(f[k + 3])[..., None] for k in range(3)]
    tmin = f[6][..., None]
    tmax = f[7][..., None]
    finite = jnp.isfinite(aabbs[:, 0])
    row_ov = []
    chunk = 16
    for c0 in range(0, c, chunk):
        cw = min(chunk, c - c0)
        blo = aabbs[c0:c0 + cw, 0:3]
        bhi = aabbs[c0:c0 + cw, 3:6]
        near = jnp.full((n_cells, S, LANE, cw), -big)
        far = jnp.full((n_cells, S, LANE, cw), big)
        for k in range(3):
            t0 = (blo[None, None, None, :, k] - o[k]) * iv[k]
            t1 = (bhi[None, None, None, :, k] - o[k]) * iv[k]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        ov = (near <= far) & (far >= tmin) & (near <= tmax) & live[..., None]
        ov = ov & finite[None, None, None, c0:c0 + cw]
        row_ov.append(jnp.any(ov, axis=2))     # [cells, S, cw]
    row_overlap = jnp.concatenate(row_ov, axis=-1)   # [cells, S, C]
    cell_overlap = jnp.any(row_overlap, axis=1)      # [cells, C]
    return (row_overlap.sum(-1).astype(jnp.float32),
            cell_overlap.sum(-1).astype(jnp.float32))


def main():
    sc = Scene.from_built(pink_room())
    baked = sc.bake(max_lights=max(16, len(sc.lights)))
    tris = baked.tris
    n_tris = int(tris.v0.shape[0])
    ck = pc.pick_ck(n_tris)
    pack = pc.pack_shaded_tris_cluster(tris, baked.data.materials, ck)
    aabbs = pc.pack_cluster_aabbs(tris, ck)

    cam = baked.data.camera
    d = camera_ray_dirs(cam, W, H, jnp.asarray([0.5, 0.5])).reshape(-1, 3)
    o = jnp.broadcast_to(cam.pos_w, d.shape)
    hit0, _ = pc.intersect_shaded_clusters_fm(
        tris, pack, aabbs, o, d, 1e-3, cull_backface=True, ck=ck,
        interpret=jax.default_backend() != "tpu")
    pos = o + hit0.t[:, None] * d
    rd = jax.random.normal(jax.random.PRNGKey(0), d.shape)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    o2 = pos + 1e-3 * rd

    lo, hi = scene_bounds(tris)
    keys = ray_sort_keys_dirq(o2, rd, lo, hi)
    srt = jax.lax.sort(
        [keys, o2[:, 0], o2[:, 1], o2[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]],
        num_keys=1)
    o_s = jnp.stack(srt[1:4], -1)
    d_s = jnp.stack(srt[4:7], -1)
    rows, n, n_cols = rays_to_rows(o_s, d_s, 1e-3, None,
                                   (o_s.shape[0],))
    n_cells = n_cols // S
    rows2 = rows.reshape(8, n_cells, S * LANE)

    row_counts, cell_counts = jax.jit(
        lambda r: overlap_counts(r, aabbs, n_cells))(rows2)
    rc = jax.device_get(row_counts)   # [cells, S]
    cc = jax.device_get(cell_counts)  # [cells]
    pair_cell = cc.sum() * S * LANE           # lane-rows tested, cell lists
    pair_row = rc.sum() * LANE                # lane-rows tested, row lists
    print(f"cells={n_cells} clusters={aabbs.shape[0]} ck={ck}")
    print(f"mean visits/cell     = {cc.mean():.1f}")
    print(f"mean visits/row      = {rc.mean():.1f}")
    print(f"pair work ratio row/cell = {pair_row / pair_cell:.3f}")
    print(f"scalar iters: cell={cc.sum():.0f}  row={rc.sum():.0f} "
          f"(x{rc.sum() / max(cc.sum(), 1):.2f})")


if __name__ == "__main__":
    main()
