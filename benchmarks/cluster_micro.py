"""Clustered-kernel timing on a medium scene vs the jnp lockstep BVH and
dense lane kernels.  Builds an ~20k-tri icosphere field; measures closest-hit
and any-hit over a 1M-ray wavefront (coherent primaries and incoherent
bounce-style rays)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
from fyp_bidirectionalpathtracer_tpu.accel import traverse
from fyp_bidirectionalpathtracer_tpu.models.procedural import (
    MaterialDesc,
    icosphere,
)
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene

N = 1_048_576


def timeit(fn, sync, iters=5):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    s = Scene()
    s.materials = [MaterialDesc(), MaterialDesc(base_color=(0.2, 0.6, 0.9, 1))]
    for i in range(8):
        for j in range(8):
            s.meshes.append(
                icosphere((i * 1.2, j * 1.2, 4.0 + ((i * 3 + j) % 5) * 0.4),
                          0.45, (i + j) % 2, subdivisions=2))
    s.lights = [{"type": "point", "pos": (4.0, 10.0, -3.0),
                 "intensity": (40.0, 40.0, 40.0)}]
    baked = s.apply_default_fixups().bake()
    n_tris = int(baked.tris.v0.shape[0])
    print(f"scene: {n_tris} tris, {-(-n_tris // pc.CK)} clusters", flush=True)

    rs = np.random.RandomState(0)
    # coherent: a pixel-ordered camera grid (adjacent rays share direction,
    # like the renderer's primary wavefronts — tiles of 1024 consecutive
    # rays span ~1/1000 of the image)
    side = 1024
    o_c = jnp.asarray(np.tile([[4.0, 4.0, -4.0]], (N, 1)).astype(np.float32))
    px, py = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
    ndc_x = (px.reshape(-1) / side * 2 - 1) * 0.9
    ndc_y = (py.reshape(-1) / side * 2 - 1) * 0.9
    fwd = np.asarray([0.05, 0.05, 1.0])
    right = np.asarray([1.0, 0.0, 0.0])
    up = np.asarray([0.0, 1.0, 0.0])
    d_c = (fwd[None] + ndc_x[:, None] * right[None]
           + ndc_y[:, None] * up[None]).astype(np.float32)
    d_c = jnp.asarray(d_c / np.linalg.norm(d_c, axis=1, keepdims=True))
    # incoherent: random origins in the field, random dirs
    o_i = jnp.asarray(rs.uniform(-1, 9.5, (N, 3)).astype(np.float32))
    d_i = rs.normal(size=(N, 3)).astype(np.float32)
    d_i = jnp.asarray(d_i / np.linalg.norm(d_i, axis=1, keepdims=True))

    out = [None]

    for ck in (64, 128, 256):
        pack = pc.pack_shaded_tris_cluster(baked.tris, baked.data.materials, ck)
        aabbs = pc.pack_cluster_aabbs(baked.tris, ck)
        occ_pack = pc.pack_tris_cluster(baked.tris, ck)

        for tag, (o, d) in (("coherent", (o_c, d_c)),
                            ("incoherent", (o_i, d_i))):
            f = jax.jit(lambda o, d, ck=ck, pack=pack, aabbs=aabbs:
                        pc.intersect_shaded_clusters(
                            baked.tris, pack, aabbs, o, d, 1e-3, ck=ck,
                            interpret=False)[0].t)
            def run(o=o, d=d, f=f):
                out[0] = f(o, d)
            dt = timeit(run, lambda: float(out[0][0]))
            print(f"ck={ck} closest {tag:10s}: {dt:8.2f} ms/1M rays",
                  flush=True)

            g = jax.jit(lambda o, d, ck=ck, occ_pack=occ_pack, aabbs=aabbs:
                        pc.occluded_clusters(
                            baked.tris, o, d, 1e-3,
                            t_max=jnp.full((N,), 2.0), tri_pack=occ_pack,
                            aabbs=aabbs, ck=ck,
                            interpret=False).astype(jnp.float32))
            def run2(o=o, d=d, g=g):
                out[0] = g(o, d)
            dt = timeit(run2, lambda: float(out[0][0]))
            print(f"ck={ck} any-hit {tag:10s}: {dt:8.2f} ms/1M rays",
                  flush=True)

    # lean closest (the 32k-131k tier) on the same 20k scene
    for tag, (o, d) in (("coherent", (o_c, d_c)), ("incoherent", (o_i, d_i))):
        fl = jax.jit(lambda o, d: pc.intersect_closest_clusters(
            baked.tris, o, d, 1e-3, interpret=False).t)
        def run4(o=o, d=d, fl=fl):
            out[0] = fl(o, d)
        dt = timeit(run4, lambda: float(out[0][0]))
        print(f"lean closest {tag:10s} : {dt:8.2f} ms/1M rays", flush=True)

    # Morton-sorted incoherent wavefronts (ops.raysort via coherent=False)
    isect = traverse.make_intersector(
        baked.data.bvh, baked.tris, materials=baked.data.materials)
    fs = jax.jit(lambda o, d: isect(o, d, 1e-3, closest=True,
                                    coherent=False).t)
    def run5():
        out[0] = fs(o_i, d_i)
    dt = timeit(run5, lambda: float(out[0][0]))
    print(f"sorted closest incoher.  : {dt:8.2f} ms/1M rays", flush=True)
    gs = jax.jit(lambda o, d: isect(
        o, d, 1e-3, t_max=jnp.full((N,), 2.0), closest=False,
        coherent=False).hit.astype(jnp.float32))
    def run6():
        out[0] = gs(o_i, d_i)
    dt = timeit(run6, lambda: float(out[0][0]))
    print(f"sorted any-hit incoher.  : {dt:8.2f} ms/1M rays", flush=True)

    # jnp lockstep BVH (the previous TPU medium-scene path)
    h = jax.jit(lambda o, d: traverse.intersect_bvh(
        baked.data.bvh, baked.tris, o, d, 1e-3).t)
    def run3():
        out[0] = h(o_c, d_c)
    dt = timeit(run3, lambda: float(out[0][0]), iters=2)
    print(f"jnp bvh closest coherent  : {dt:8.2f} ms/1M rays", flush=True)


if __name__ == "__main__":
    main()
