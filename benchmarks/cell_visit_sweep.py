"""Cell-size sweep: exact cluster-shortlist visits vs sort-cell size on a
cosine-weighted pink_room bounce wavefront (CPU-only analysis).

Informs accel/pallas_cluster.cell_rows: smaller cells tighten exact
shortlists (visits/cell 19.4 at 1024 rays -> 13.4 at 256, pair work -33%)
but the in-frame measurement was NEGATIVE (pink 681 -> 883 ms at 2-row
cells): the slab-cull machinery runs on sublane-padded vregs and the group
predicate syncs scale with total visits.  See BASELINE.md round-4 notes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/cell_visit_sweep.py
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
from fyp_bidirectionalpathtracer_tpu.accel.traverse import intersect_bvh
from fyp_bidirectionalpathtracer_tpu.models.pink_room import pink_room
from fyp_bidirectionalpathtracer_tpu.ops.raysort import ray_sort_keys_dirq, scene_bounds
from fyp_bidirectionalpathtracer_tpu.scene.camera import camera_ray_dirs
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene

W, H = 1280, 720

def cell_visits(o_s, d_s, aabbs, cell):
    n = o_s.shape[0]
    n_cells = n // cell
    o = o_s[:n_cells * cell].reshape(n_cells, cell, 3)
    d = d_s[:n_cells * cell].reshape(n_cells, cell, 3)
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1.0),
                    jnp.where(d >= 0, 2e12, -2e12))
    finite = jnp.isfinite(aabbs[:, 0])
    counts = jnp.zeros((n_cells,), jnp.int32)
    big = jnp.float32(1e30)
    c = aabbs.shape[0]
    for c0 in range(0, c, 16):
        cw = min(16, c - c0)
        blo = aabbs[c0:c0 + cw, 0:3]; bhi = aabbs[c0:c0 + cw, 3:6]
        near = jnp.full((n_cells, cell, cw), -big)
        far = jnp.full((n_cells, cell, cw), big)
        for k in range(3):
            t0 = (blo[None, None, :, k] - o[..., k:k+1]) * inv[..., k:k+1]
            t1 = (bhi[None, None, :, k] - o[..., k:k+1]) * inv[..., k:k+1]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        ov = (near <= far) & (far >= 1e-3) & finite[None, None, c0:c0+cw]
        counts = counts + jnp.any(ov, axis=1).sum(-1).astype(jnp.int32)
    return counts

def main():
    sc = Scene.from_built(pink_room())
    baked = sc.bake(max_lights=max(16, len(sc.lights)))
    tris = baked.tris
    ck = pc.pick_ck(int(tris.v0.shape[0]))
    aabbs = pc.pack_cluster_aabbs(tris, ck)
    cam = baked.data.camera
    d = camera_ray_dirs(cam, W, H, jnp.asarray([0.5, 0.5])).reshape(-1, 3)
    o = jnp.broadcast_to(cam.pos_w, d.shape)
    hit0 = intersect_bvh(baked.data.bvh, tris, o, d, 1e-3)
    pos = o + jnp.minimum(hit0.t, 100.0)[:, None] * d
    # geometric normal of hit tri (cosine-lobe axis); miss lanes get +y
    tri = jnp.maximum(hit0.tri, 0)
    n = jnp.cross(tris.e1[tri], tris.e2[tri])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = jnp.where((hit0.tri >= 0)[:, None], n, jnp.array([0.0, 1.0, 0.0]))
    # flip toward the incoming ray's source side
    n = jnp.where(jnp.sum(n * d, -1, keepdims=True) > 0, -n, n)
    key = jax.random.PRNGKey(1)
    u1, u2 = jax.random.uniform(key, (2,) + hit0.t.shape)
    r = jnp.sqrt(u1); phi = 2 * jnp.pi * u2
    # local frame
    up = jnp.where(jnp.abs(n[:, 1:2]) < 0.9, jnp.array([0., 1., 0.]), jnp.array([1., 0., 0.]))
    tx = jnp.cross(up, n); tx /= jnp.maximum(jnp.linalg.norm(tx, -1, keepdims=True), 1e-20)
    ty = jnp.cross(n, tx)
    rd = (tx * (r * jnp.cos(phi))[:, None] + ty * (r * jnp.sin(phi))[:, None]
          + n * jnp.sqrt(jnp.maximum(1 - u1, 0.0))[:, None])
    o2 = pos + 1e-3 * rd
    lo, hi = scene_bounds(tris)
    keys = ray_sort_keys_dirq(o2, rd, lo, hi)
    srt = jax.lax.sort([keys, o2[:,0], o2[:,1], o2[:,2], rd[:,0], rd[:,1], rd[:,2]], num_keys=1)
    o_s = jnp.stack(srt[1:4], -1); d_s = jnp.stack(srt[4:7], -1)
    jit_cv = jax.jit(cell_visits, static_argnames=("cell",))
    for cell in (1024, 512, 256, 128):
        v = np.asarray(jit_cv(o_s, d_s, aabbs, cell=cell))
        print(f"cosine-bounce cell{cell}: visits/cell={v.mean():.1f} sum={v.sum()} "
              f"pairwork={v.sum()*cell/1e6:.0f}M", flush=True)

if __name__ == "__main__":
    main()
