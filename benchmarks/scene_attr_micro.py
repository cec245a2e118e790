"""In-frame stage attribution for any scene via the config stubs
(CLAUDE.md: standalone micros lie; difference full jitted frames).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/scene_attr_micro.py \
      pink_room [--size WxH] [--variant full|noshadow|noext|nosplat|none]

Run FYP_STUB_TRACE_KERNEL=1 variants in a SEPARATE process (the flag is
read at trace time, so a warm jit cache would mask it).
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="pink_room")
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--variant", default="full",
                    choices=["full", "noshadow", "noext", "nosplat", "none"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    from fyp_bidirectionalpathtracer_tpu.pipeline.app import load_scene
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT,
        GBUF_FRAME_INIT,
        render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig,
        RenderConfig,
    )

    kw = {"max_depth": args.depth}
    if args.variant in ("noshadow", "none"):
        kw["debug_stub_shadows"] = True
    if args.variant in ("noext", "none"):
        kw["debug_stub_extensions"] = True
    if args.variant == "nosplat":
        kw["splat_mode"] = "skip"
    cfg = RenderConfig(width=w, height=h, bdpt=BDPTConfig(**kw))
    scene = load_scene(args.scene)
    baked = scene.bake(max_lights=max(16, len(scene.lights)))
    fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))
    accum = AccumState.create(h, w)
    bmfr = BMFRState.create(h, w)
    reset = jnp.asarray(False)

    def step(i, accum, bmfr):
        return fn(baked, baked.data.camera, accum, bmfr,
                  jnp.uint32(GBUF_FRAME_INIT + i),
                  jnp.uint32(BDPT_FRAME_INIT + i), reset)

    for i in range(2):
        ch, accum, bmfr = step(i, accum, bmfr)
    float(ch["PipelineOutput"][0, 0, 0])
    t0 = time.perf_counter()
    for i in range(2, 2 + args.iters):
        ch, accum, bmfr = step(i, accum, bmfr)
    float(ch["PipelineOutput"][0, 0, 0])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"scene": args.scene, "variant": args.variant,
                      "ms_per_frame": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
