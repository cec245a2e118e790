"""Divergent-wavefront traversal experiments (real chip).

The pink_room bounce-trace wall is ~117 ms/1M through the shaded cluster
tier (ck=64, ray order).  Measured so far (v5e, 0.92M bounce rays):

  proxy-t seed alone      110.5 ms  (per-CELL culling still fails: 1024
                                     divergent rays union-cover everything)
  ck=256 ray order        141.6 ms  (culling DOES pay at ck=64; giant-ck
                                     is dead, ck=1320 OOMs VMEM)
  A octant-major sort      88.3 ms  (direction in the HIGH key bits —
                                     the original origin-major key's ~2%
                                     was direction-incoherent cells)
  C A+proxy256             86.5 ms

This script measures the next refinements on top of A:
  D. directional cluster visit order (signed projection along the cell's
     mean direction instead of origin-centroid distance)
  E. finer direction quantization (2 bits/axis, ray_sort_keys_dirq)
  F. D+E, and D+E+proxy256

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/divergent_micro.py
"""
import time

import jax
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
from fyp_bidirectionalpathtracer_tpu.models.pink_room import pink_room
from fyp_bidirectionalpathtracer_tpu.ops.raysort import (
    make_permutation,
    ray_sort_keys,
    ray_sort_keys_dirq,
    scene_bounds,
)
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

    ck0 = pc.pick_ck(n_tris)
    pack0 = pc.pack_shaded_tris_cluster(tris, baked.data.materials, ck0)
    aabbs0 = pc.pack_cluster_aabbs(tris, ck0)
    hit0, _ = pc.intersect_shaded_clusters_fm(
        tris, pack0, aabbs0, o, d, 0.0, cull_backface=True, ck=ck0,
        interpret=False)
    pos = o + hit0.t[:, None] * d
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, d.shape)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    o2 = pos + 1e-3 * rd

    lo, hi = scene_bounds(tris)
    proxy = pc.pack_proxy_tris(tris, 256)

    def sorted_trace(oo, dd, keys, prx, directional):
        perm, inv = make_permutation(keys)
        od = jnp.concatenate([oo, dd], -1)[perm]
        hit, _ = pc.intersect_shaded_clusters_fm(
            tris, pack0, aabbs0, od[:, :3], od[:, 3:6], 1e-4, ck=ck0,
            interpret=False, proxy_pack=prx, directional=directional)
        return hit.t[inv]

    def mk(keyfn, prx, directional):
        return jax.jit(lambda oo, dd: sorted_trace(
            oo, dd, keyfn(oo, dd, lo, hi), prx, directional))

    oct_key = lambda oo, dd, lo, hi: ray_sort_keys(  # noqa: E731
        oo, dd, lo, hi, octant_major=True)

    timeit("D oct-sort + dir order      ", mk(oct_key, None, True), o2, rd)
    timeit("E dirq-sort + centroid order", mk(ray_sort_keys_dirq, None, False),
           o2, rd)
    timeit("F dirq-sort + dir order     ", mk(ray_sort_keys_dirq, None, True),
           o2, rd)
    timeit("F+proxy256                  ", mk(ray_sort_keys_dirq, proxy, True),
           o2, rd)

    # sorted divergent ANY-HIT (the connection-shadow shape): 3-stack from
    # scattered origins toward scattered targets
    key2 = jax.random.PRNGKey(1)
    tgt = jax.random.uniform(key2, o2.shape, minval=-2.0, maxval=2.0)
    to_t = tgt - pos
    dist = jnp.linalg.norm(to_t, axis=-1, keepdims=True)
    sh_d = to_t / jnp.maximum(dist, 1e-6)

    def occl_plain(oo, dd, tm):
        return pc.occluded_clusters(
            tris, oo, dd, 1e-4, tm, tri_pack=pc.pack_tris_cluster(tris, ck0),
            aabbs=aabbs0, ck=ck0, interpret=False).astype(jnp.float32)

    occ_pack = pc.pack_tris_cluster(tris, ck0)

    def occl(oo, dd, tm, keyfn, directional):
        keys = keyfn(oo, dd, lo, hi)
        perm, inv = make_permutation(keys)
        packed = jnp.concatenate([oo, dd, tm[:, None]], -1)[perm]
        occ = pc.occluded_clusters(
            tris, packed[:, :3], packed[:, 3:6], 1e-4, packed[:, 6],
            tri_pack=occ_pack, aabbs=aabbs0, ck=ck0, interpret=False,
            directional=directional)
        return occ.astype(jnp.float32)[inv]

    timeit("anyhit divergent unsorted   ",
           jax.jit(lambda oo, dd, tm: occl_plain(oo, dd, tm)),
           pos + 1e-3 * sh_d, sh_d, dist[:, 0])
    timeit("anyhit divergent dirq-sorted",
           jax.jit(lambda oo, dd, tm: occl(oo, dd, tm, ray_sort_keys_dirq,
                                           True)),
           pos + 1e-3 * sh_d, sh_d, dist[:, 0])


if __name__ == "__main__":
    main()
