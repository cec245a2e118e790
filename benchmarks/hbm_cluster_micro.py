"""HBM demand-paged cluster tier on a ~250k-tri scene (beyond the VMEM
pack ceiling): coherent/incoherent any-hit + closest over 1M rays, vs the
jnp lockstep BVH."""
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


def timeit(fn, sync, iters=3):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    s = Scene()
    s.materials = [MaterialDesc()]
    for i in range(14):
        for j in range(14):
            s.meshes.append(
                icosphere((i * 1.1, j * 1.1, 4.0 + ((i * 5 + j) % 7) * 0.3),
                          0.45, 0, subdivisions=2))
    s.lights = [{"type": "point", "pos": (7.0, 16.0, -3.0),
                 "intensity": (60.0, 60.0, 60.0)}]
    baked = s.apply_default_fixups().bake()
    n_tris = int(baked.tris.v0.shape[0])
    print(f"scene: {n_tris} tris, {-(-n_tris // pc.CK)} clusters "
          f"(VMEM lean ceiling {traverse.CLUSTER_OCC_THRESHOLD})", flush=True)

    rs = np.random.RandomState(0)
    side = 1024
    o_c = jnp.asarray(np.tile([[7.0, 7.0, -5.0]], (N, 1)).astype(np.float32))
    px, py = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
    ndc_x = (px.reshape(-1) / side * 2 - 1) * 0.8
    ndc_y = (py.reshape(-1) / side * 2 - 1) * 0.8
    d_c = (np.asarray([0.02, 0.02, 1.0])[None]
           + ndc_x[:, None] * np.asarray([1.0, 0, 0])[None]
           + ndc_y[:, None] * np.asarray([0, 1.0, 0])[None]).astype(np.float32)
    d_c = jnp.asarray(d_c / np.linalg.norm(d_c, axis=1, keepdims=True))
    o_i = jnp.asarray(rs.uniform(-1, 15.5, (N, 3)).astype(np.float32))
    d_i = rs.normal(size=(N, 3)).astype(np.float32)
    d_i = jnp.asarray(d_i / np.linalg.norm(d_i, axis=1, keepdims=True))

    pack = pc.pack_tris_cluster_hbm(baked.tris)
    aabbs = pc.pack_cluster_aabbs(baked.tris)
    out = [None]

    # correctness spot check vs brute on a small slice
    hb = traverse.intersect_brute(baked.tris, o_c[:512], d_c[:512], 1e-3)
    hh = pc.intersect_closest_clusters_hbm(
        baked.tris, o_c[:512], d_c[:512], 1e-3,
        tri_pack=pack, aabbs=aabbs, interpret=False)
    agree = (np.asarray(hb.tri) == np.asarray(hh.tri)).mean()
    print(f"closest id agreement vs brute (512 rays): {agree:.4f}", flush=True)

    for tag, (o, d) in (("coherent", (o_c, d_c)), ("incoherent", (o_i, d_i))):
        g = jax.jit(lambda o, d: pc.occluded_clusters_hbm(
            baked.tris, o, d, 1e-3, t_max=jnp.full((N,), 2.0),
            tri_pack=pack, aabbs=aabbs, interpret=False).astype(jnp.float32))
        def run(o=o, d=d, g=g):
            out[0] = g(o, d)
        dt = timeit(run, lambda: float(out[0][0]))
        print(f"hbm any-hit {tag:10s}: {dt:9.2f} ms/1M rays", flush=True)

        f = jax.jit(lambda o, d: pc.intersect_closest_clusters_hbm(
            baked.tris, o, d, 1e-3, tri_pack=pack, aabbs=aabbs,
            interpret=False).t)
        def run2(o=o, d=d, f=f):
            out[0] = f(o, d)
        dt = timeit(run2, lambda: float(out[0][0]))
        print(f"hbm closest {tag:10s}: {dt:9.2f} ms/1M rays", flush=True)

    # ck sweep for the closest kernel (coherent rays): smaller clusters
    # mean finer culling granularity per tile
    for ck in (64, 128):
        pack_s = pc.pack_tris_cluster_hbm(baked.tris, ck)
        aabbs_s = pc.pack_cluster_aabbs(baked.tris, ck)
        f = jax.jit(lambda o, d, ck=ck, pack_s=pack_s, aabbs_s=aabbs_s:
                    pc.intersect_closest_clusters_hbm(
                        baked.tris, o, d, 1e-3, tri_pack=pack_s,
                        aabbs=aabbs_s, ck=ck, interpret=False).t)
        def run4(f=f):
            out[0] = f(o_c, d_c)
        dt = timeit(run4, lambda: float(out[0][0]))
        print(f"hbm closest coherent ck={ck}: {dt:9.2f} ms/1M rays",
              flush=True)

    h = jax.jit(lambda o, d: traverse.intersect_bvh(
        baked.data.bvh, baked.tris, o, d, 1e-3).t)
    def run3():
        out[0] = h(o_c[:N // 8], d_c[:N // 8])
    dt = timeit(run3, lambda: float(out[0][0]), iters=1)
    print(f"jnp bvh closest coherent : {dt * 8:9.2f} ms/1M rays (extrap x8)",
          flush=True)


if __name__ == "__main__":
    main()
