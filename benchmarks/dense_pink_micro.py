"""Can brute-force dense lanes beat cluster culling for DIVERGENT rays?

pink_room bounce wavefronts cost ~117 ms/1M through the shaded cluster tier
(ck=64) because divergent 1024-ray tiles overlap nearly every cluster — the
culling pays slab+branch overhead without skipping work.  The dense lane
kernel tests all T triangles with zero culling overhead; at 10.5k tris the
shaded pack is ~2 MB of VMEM, well under budget.  This measures both tiers
on coherent (primary) and divergent (bounce) wavefronts, sweeping the dense
kernel's triangle chunk size.

Run on the real chip:  python benchmarks/dense_pink_micro.py
"""
import time

import jax
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
from fyp_bidirectionalpathtracer_tpu.accel import pallas_lane as lane
from fyp_bidirectionalpathtracer_tpu.models.pink_room import pink_room
from fyp_bidirectionalpathtracer_tpu.scene.camera import camera_ray_dirs
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene

W, H = 1280, 720


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(tag, fn, *args, n=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    scene = pink_room()
    sc = Scene.from_built(scene)
    baked = sc.bake(max_lights=max(16, len(sc.lights)))
    tris = baked.tris
    n_tris = int(tris.v0.shape[0])
    print(f"pink_room: {n_tris} tris", flush=True)

    cam = baked.data.camera
    d = camera_ray_dirs(cam, W, H, jnp.asarray([0.5, 0.5])).reshape(-1, 3)
    o = jnp.broadcast_to(cam.pos_w, d.shape)

    # divergent bounce-like rays: random dirs from primary hit points
    ck = pc.pick_ck(n_tris)
    pack_c = pc.pack_shaded_tris_cluster(tris, baked.data.materials, ck)
    aabbs = pc.pack_cluster_aabbs(tris, ck)
    hit0, _ = pc.intersect_shaded_clusters_fm(
        tris, pack_c, aabbs, o, d, 0.0, cull_backface=True, ck=ck,
        interpret=False)
    pos = o + hit0.t[:, None] * d
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, d.shape)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    o2 = pos + 1e-3 * rd

    jit_cluster = jax.jit(lambda oo, dd: pc.intersect_shaded_clusters_fm(
        tris, pack_c, aabbs, oo, dd, 1e-4, ck=ck, interpret=False)[0].t)
    timeit(f"cluster shaded ck={ck} primary", jit_cluster, o, d)
    timeit(f"cluster shaded ck={ck} bounce ", jit_cluster, o2, rd)

    pack_l = lane.pack_shaded_tris_lane(tris, baked.data.materials)
    print(f"lane pack: {pack_l.shape} = "
          f"{pack_l.size*4/2**20:.1f} MB", flush=True)
    for chunk in (256, 1024):
        t_pad = pack_l.shape[0]
        bounds = tuple(
            (s, min(chunk, t_pad - s)) for s in range(0, t_pad, chunk))

        def dense(oo, dd, bounds=bounds):
            rows, n, _ = lane.rays_to_rows(oo, dd, 1e-4, None, oo.shape[:-1])
            out = lane._launch_shaded(rows, pack_l, bounds, n_tris, False,
                                      False)
            return out[0]

        jd = jax.jit(dense)
        timeit(f"dense lanes chunk={chunk} primary", jd, o, d)
        timeit(f"dense lanes chunk={chunk} bounce ", jd, o2, rd)


if __name__ == "__main__":
    main()
