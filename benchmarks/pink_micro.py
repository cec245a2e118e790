"""pink_room cluster-tier trace micro-benchmark (real chip).

Times the individual trace operations a depth-3 frame performs, to locate
the wall inside the 720p pink_room frame: closest-hit on coherent primary
rays, closest-hit on bounce (sorted-incoherent) rays, and the batched
any-hit shadow queries.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fyp_bidirectionalpathtracer_tpu.models.pink_room import pink_room
from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
from fyp_bidirectionalpathtracer_tpu.scene.camera import camera_ray_dirs
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene

W, H = 1280, 720


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(tag, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    sync(out[0].t if hasattr(out[0], "t") else out[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    sync(out[0].t if hasattr(out[0], "t") else out[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:.1f} ms", flush=True)
    return out


def main():
    scene = pink_room()
    sc = Scene.from_built(scene)
    baked = sc.bake(max_lights=max(16, len(sc.lights)))
    n_tris = int(baked.tris.v0.shape[0])
    print(f"pink_room: {n_tris} tris", flush=True)

    cam = baked.data.camera
    d = camera_ray_dirs(cam, W, H, jnp.asarray([0.5, 0.5]))
    o = jnp.broadcast_to(cam.pos_w, d.shape)
    trace = make_shaded_tracer(baked)
    intersect = baked.intersector()

    jit_closest_coh = jax.jit(
        lambda o, d: trace(o, d, 0.0, jnp.broadcast_to(cam.pos_w, d.shape),
                           cull_backface=True)
    )
    hit, sd = timeit("closest coherent (primary, 0.92M)", jit_closest_coh, o, d)

    # bounce-like rays: random directions from hit points (incoherent)
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, d.shape)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    origin2 = sd.pos_w + 1e-3 * rd

    jit_closest_inc = jax.jit(
        lambda o, d: trace(o, d, 1e-4, o, cull_backface=False, coherent=False)
    )
    timeit("closest incoherent (bounce, 0.92M)", jit_closest_inc, origin2, rd)

    # the shape the FRAME actually pays: bounce rays traced UNSORTED
    # (passes/bdpt.shoot_ray uses the default coherent=True)
    jit_closest_unsorted = jax.jit(
        lambda o, d: trace(o, d, 1e-4, o, cull_backface=False, coherent=True)
    )
    timeit("closest bounce UNSORTED (0.92M)", jit_closest_unsorted,
           origin2, rd)

    # ck sweep on the shaded cluster tier (pink_room's production tier)
    from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc

    for ck in (64, 128):
        pack_s = pc.pack_shaded_tris_cluster(baked.tris, baked.data.materials,
                                             ck)
        aabbs_s = pc.pack_cluster_aabbs(baked.tris, ck)
        jit_ck = jax.jit(
            lambda o, d, ck=ck, pack_s=pack_s, aabbs_s=aabbs_s:
            pc.intersect_shaded_clusters(
                baked.tris, pack_s, aabbs_s, o, d, 1e-4, ck=ck,
                interpret=False,
            )[0].t
        )
        for tag, (oo, dd) in (("primary", (o, d)), ("bounce", (origin2, rd))):
            timeit(f"shaded closest ck={ck} {tag} (0.92M)",
                   lambda oo=oo, dd=dd, j=jit_ck: (j(oo, dd),))

    # shadow batch: 3 stacked wavefronts toward one point (the NEE shape)
    lp = jnp.asarray([0.0, 2.0, 0.0])
    sh_o = jnp.stack([sd.pos_w] * 3)
    to_l = lp - sh_o
    dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    sh_d = to_l / dist

    jit_shadow = jax.jit(
        lambda o, d, t: (intersect(o, d, 1e-4, t, closest=False,
                                   coherent=True).t,)
    )
    timeit("any-hit shadow batch (3x0.92M, coherent)", jit_shadow,
           sh_o, sh_d, dist[..., 0])

    jit_shadow_inc = jax.jit(
        lambda o, d, t: (intersect(o, d, 1e-4, t, closest=False,
                                   coherent=False).t,)
    )
    timeit("any-hit shadow batch (3x0.92M, incoherent-flag)", jit_shadow_inc,
           sh_o, sh_d, dist[..., 0])


if __name__ == "__main__":
    main()
