"""Where does the textured-scene wavefront frame spend its time?  (TPU)

Times, for the `textured` CLI scene at 1280x720 depth 3:
  - one shaded closest trace (the per-bounce unit; 6 per frame)
  - one 3-stacked any-hit batch (the NEE shape; ~3-4 batches per frame)
  - the texture taps alone (6 packed gathers at 0.92M)
  - full frame / frame with estimators disabled (isolates est XLA cost)

Honest sync = scalar readback (CLAUDE.md).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def timeit(tag, fn, *args, n=8, warm=2, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag}: {dt:.2f} ms", flush=True)
    return out


def main():
    import argparse

    from fyp_bidirectionalpathtracer_tpu.ops.shading import (
        make_shaded_tracer,
    )
    from fyp_bidirectionalpathtracer_tpu.ops.texture import (
        sample_or_constant,
    )
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT,
        GBUF_FRAME_INIT,
        render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.scene.camera import camera_ray_dirs
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig,
        RenderConfig,
    )

    p = argparse.ArgumentParser()
    p.add_argument("scene", nargs="?", default="textured")
    args = p.parse_args()

    W, H, D = 1280, 720, 3
    from fyp_bidirectionalpathtracer_tpu.pipeline.app import load_scene

    scene = load_scene(args.scene)
    baked = scene.bake(max_lights=max(16, len(scene.lights)))
    print(f"{args.scene}: {int(baked.tris.v0.shape[0])} tris, "
          f"atlas {tuple(baked.data.textures.data.shape)}", flush=True)

    cam = baked.data.camera
    d = camera_ray_dirs(cam, W, H, jnp.asarray([0.5, 0.5]))
    o = jnp.broadcast_to(cam.pos_w, d.shape)

    trace = make_shaded_tracer(baked)
    jit_closest = jax.jit(
        lambda o, d: trace(o, d, 0.0, jnp.broadcast_to(cam.pos_w, d.shape),
                           cull_backface=True)
    )
    hit, sd = timeit("shaded closest (0.92M, x6/frame)", jit_closest, o, d)

    intersect = baked.intersector()
    lp = jnp.asarray([0.0, 1.8, 0.0])
    sh_o = jnp.stack([sd.pos_w] * 3)
    to_l = lp - sh_o
    dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    sh_d = to_l / dist
    jit_shadow = jax.jit(
        lambda o, d, t: (intersect(o, d, 1e-4, t, closest=False,
                                   coherent=True).t,)
    )
    timeit("any-hit batch (3x0.92M, x3-4/frame)", jit_shadow,
           sh_o, sh_d, dist[..., 0])

    # texture taps alone: 6 vertex fetches of 0.92M
    atlas = baked.data.textures
    slot = jnp.zeros(sd.uv.shape[:-1], jnp.int32)
    const = jnp.ones(sd.uv.shape[:-1] + (4,), jnp.float32)

    def taps(uv):
        out = 0.0
        for k in range(6):
            out = out + sample_or_constant(atlas, slot, uv + 0.01 * k, const)
        return out

    timeit("6 packed texture taps (0.92M each)", jax.jit(taps), sd.uv)

    # full frames with estimators toggled
    def frame(cfg_kw, tag):
        kw = {"max_depth": D, **cfg_kw}
        cfg = RenderConfig(width=W, height=H, bdpt=BDPTConfig(**kw))
        fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))
        accum = AccumState.create(H, W)
        bmfr = BMFRState.create(H, W)

        def step(i):
            ch, a2, b2 = fn(baked, cam, accum, bmfr,
                            jnp.uint32(GBUF_FRAME_INIT + i),
                            jnp.uint32(BDPT_FRAME_INIT + i),
                            jnp.asarray(False))
            return ch["PipelineOutput"]

        timeit(tag, step, 3, n=6)

    frame({}, "full frame")
    frame({"enable_connections": False}, "frame -est3")
    frame({"enable_light_tracing": False}, "frame -est2")
    frame({"enable_light_tracing": False, "enable_connections": False},
          "frame est1 only")
    frame({"max_depth": 1}, "frame depth=1")


if __name__ == "__main__":
    main()
