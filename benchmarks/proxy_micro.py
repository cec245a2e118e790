"""Proxy-t seeding micro-benchmark (real chip).

Measures pink_room closest-hit through the shaded cluster tier with and
without the pack_proxy_tris best_t seed, on coherent (primary) and
divergent (bounce) wavefronts, sweeping P.  The hypothesis: seeding best_t
with a real hit from the P largest triangles lets the per-cluster slab
culling reject most clusters even for divergent tiles (the 117 ms/1M wall,
BASELINE.md round-2 anatomy).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/proxy_micro.py
"""
import time

import jax
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
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

    ck = pc.pick_ck(n_tris)
    pack = pc.pack_shaded_tris_cluster(tris, baked.data.materials, ck)
    aabbs = pc.pack_cluster_aabbs(tris, ck)

    hit0, _ = pc.intersect_shaded_clusters_fm(
        tris, pack, aabbs, o, d, 0.0, cull_backface=True, ck=ck,
        interpret=False)
    pos = o + hit0.t[:, None] * d
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, d.shape)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    o2 = pos + 1e-3 * rd

    base = jax.jit(lambda oo, dd: pc.intersect_shaded_clusters_fm(
        tris, pack, aabbs, oo, dd, 1e-4, ck=ck, interpret=False)[0].t)
    timeit("no-proxy primary", base, o, d)
    timeit("no-proxy bounce ", base, o2, rd)

    for p in (256, 512, 1024):
        proxy = pc.pack_proxy_tris(tris, p)
        fn = jax.jit(lambda oo, dd, proxy=proxy:
                     pc.intersect_shaded_clusters_fm(
                         tris, pack, aabbs, oo, dd, 1e-4, ck=ck,
                         interpret=False, proxy_pack=proxy)[0].t)
        timeit(f"proxy P={p:4d} primary", fn, o, d)
        timeit(f"proxy P={p:4d} bounce ", fn, o2, rd)


if __name__ == "__main__":
    main()
