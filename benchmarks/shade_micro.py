"""Where does a make_shaded_tracer closest trace spend time beyond the
cluster kernel?  (pink_room, 0.92M coherent primary rays, TPU.)

Suspects: the [OUT_W, N] -> [N, OUT_W] field transpose, the texture taps,
the ShadingData decode math.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timeit(tag, fn, *args, n=8, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    print(f"{tag}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms",
          flush=True)
    return out


def main():
    from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
    from fyp_bidirectionalpathtracer_tpu.ops.shading import (
        make_shaded_tracer,
        shading_from_fields,
    )
    from fyp_bidirectionalpathtracer_tpu.ops.texture import sample_or_constant
    from fyp_bidirectionalpathtracer_tpu.pipeline.app import load_scene
    from fyp_bidirectionalpathtracer_tpu.scene.camera import camera_ray_dirs

    W, H = 1280, 720
    scene = load_scene("pink-room")
    baked = scene.bake(max_lights=max(16, len(scene.lights)))
    cam = baked.data.camera
    d = camera_ray_dirs(cam, W, H, jnp.asarray([0.5, 0.5]))
    o = jnp.broadcast_to(cam.pos_w, d.shape)
    n_tris = int(baked.tris.v0.shape[0])
    ck = pc.pick_ck(n_tris)
    pack = pc.pack_shaded_tris_cluster(baked.tris, baked.data.materials, ck)
    aabbs = pc.pack_cluster_aabbs(baked.tris, ck)
    print(f"pink: {n_tris} tris ck={ck}", flush=True)

    # 1. raw kernel (includes the [OUT_W,N].T reshape inside the wrapper)
    raw = jax.jit(lambda o, d: pc.intersect_shaded_clusters(
        baked.tris, pack, aabbs, o, d, 0.0, cull_backface=True,
        ck=ck, interpret=False))
    hit, fields = timeit("raw intersect_shaded_clusters", raw, o, d)

    # 1b. kernel output WITHOUT the transpose (sum the [OUT_W, N] rows)
    def raw_nt(o, d):
        from fyp_bidirectionalpathtracer_tpu.accel.pallas_lane import (
            rays_to_rows,
        )
        shape = o.shape[:-1]
        rows, n, n_cols = rays_to_rows(o, d, 0.0, None, shape)
        out = pc._launch_cluster_shaded(
            rows, aabbs, pack, int(aabbs.shape[0]), ck, n_tris, True, False)
        return (out[0, :8, :1],)
    timeit("kernel only (no transpose)", jax.jit(raw_nt), o, d)

    # 2. full tracer
    trace = make_shaded_tracer(baked)
    full = jax.jit(lambda o, d: trace(o, d, 0.0, o, cull_backface=True))
    timeit("full trace (kernel+decode)", full, o, d)

    # 3. decode alone on cached fields
    dec = jax.jit(lambda f, o, d: shading_from_fields(
        f, baked.data.textures, hit, o, d, o))
    timeit("shading_from_fields alone", dec, fields, o, d)

    # 4. one base tap alone
    sd = dec(fields, o, d)
    tap = jax.jit(lambda uv, s: (sample_or_constant(
        baked.data.textures, s, uv,
        jnp.ones(uv.shape[:-1] + (4,), jnp.float32)),))
    slot = jnp.zeros(sd.uv.shape[:-1], jnp.int32)
    timeit("one packed texture tap", tap, sd.uv, slot)


if __name__ == "__main__":
    main()
