"""Per-scene full-frame timing on the real chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/scene_frame_micro.py \
           [scene ...] [--size WxH] [--depth D]

Times the jitted reference-default pipeline (G-buffer + BDPT + accumulation,
denoise off) exactly like bench.py, for any scene name the CLI app accepts
(cornell / textured / pink-room / ...).  Honest sync = scalar readback
(block_until_ready is a no-op on the tunneled platform, CLAUDE.md).
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def time_scene(name: str, width: int, height: int, depth: int,
               warmup: int = 3, iters: int = 10,
               sort_bounces: bool | None = None,
               const_scene: bool = False,
               bounce_tex_mean: bool = False,
               parallel_subpaths: bool = False,
               merge_shadow_batches: bool = False) -> dict:
    from fyp_bidirectionalpathtracer_tpu.pipeline.app import load_scene
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT,
        GBUF_FRAME_INIT,
        render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig, RenderConfig

    # None = keep the production default (BDPTConfig.sort_bounces)
    overrides = {} if sort_bounces is None else {"sort_bounces": sort_bounces}
    if bounce_tex_mean:
        overrides["bounce_tex_mean"] = True
    if parallel_subpaths:
        overrides["parallel_subpaths"] = True
    if merge_shadow_batches:
        overrides["merge_shadow_batches"] = True
    cfg = RenderConfig(width=width, height=height,
                       bdpt=BDPTConfig(max_depth=depth, **overrides))
    scene = load_scene(name)
    baked = scene.bake(max_lights=max(16, len(scene.lights)))
    if const_scene:
        # close the baked scene over the jit: every scene table becomes an
        # XLA constant (gathers from constant tables measured 8-13 ms/1M vs
        # ~24 ms/1M argument-resident — benchmarks/gather_tier_micro.py)
        fn_c = jax.jit(
            lambda camera, accum, bmfr, gf, bf, reset: render_frame_fn(
                baked, camera, accum, bmfr, gf, bf, reset, cfg=cfg))

        def step(i, accum, bmfr):
            return fn_c(baked.data.camera, accum, bmfr,
                        jnp.uint32(GBUF_FRAME_INIT + i),
                        jnp.uint32(BDPT_FRAME_INIT + i), reset)
    else:
        fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))

        def step(i, accum, bmfr):
            return fn(baked, baked.data.camera, accum, bmfr,
                      jnp.uint32(GBUF_FRAME_INIT + i),
                      jnp.uint32(BDPT_FRAME_INIT + i), reset)

    accum = AccumState.create(height, width)
    bmfr = BMFRState.create(height, width)
    reset = jnp.asarray(False)

    for i in range(warmup):
        ch, accum, bmfr = step(i, accum, bmfr)
    float(ch["PipelineOutput"][0, 0, 0])
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        ch, accum, bmfr = step(i, accum, bmfr)
    float(ch["PipelineOutput"][0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    tris = int(baked.tris.v0.shape[0])
    return {"scene": name, "ms_per_frame": round(dt * 1e3, 2),
            "tris": tris, "resolution": f"{width}x{height}", "depth": depth,
            "sort_bounces": sort_bounces, "const_scene": const_scene,
            "bounce_tex_mean": bounce_tex_mean,
            "parallel_subpaths": parallel_subpaths,
            "merge_shadow_batches": merge_shadow_batches}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scenes", nargs="*", default=["textured"])
    p.add_argument("--size", default="1280x720")
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--sort-bounces", action=argparse.BooleanOptionalAction,
                   default=None)  # None = production default
    p.add_argument("--const-scene", action="store_true")
    p.add_argument("--bounce-mean", action="store_true")
    p.add_argument("--parallel-subpaths", action="store_true")
    p.add_argument("--merge-shadows", action="store_true")
    args = p.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    for name in args.scenes or ["textured"]:
        print(json.dumps(time_scene(name, w, h, args.depth,
                                    sort_bounces=args.sort_bounces,
                                    const_scene=args.const_scene,
                                    bounce_tex_mean=args.bounce_mean,
                                    parallel_subpaths=args.parallel_subpaths,
                                    merge_shadow_batches=args.merge_shadows)),
              flush=True)


if __name__ == "__main__":
    main()
