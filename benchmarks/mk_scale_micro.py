"""Megakernel cost vs triangle count / textured rows, on the real chip.

Separates the textured-room stub cost (115 ms) into (a) trace scaling with
triangle count and (b) deferred-texture row overhead:
  cornell          34 tris, untextured kernel
  room-untextured  342 tris, images stripped -> untextured kernel
  room-textured    342 tris, textured kernel (stub replay)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/mk_scale_micro.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp


def time_mk(baked, cfg, warmup=2, iters=5):
    from fyp_bidirectionalpathtracer_tpu.accel import pallas_frame as pf
    from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gbuffer_mod

    assert pf.supports_megakernel(baked, cfg), "scene must qualify"
    jit = gbuffer_mod.pixel_jitter_for_frame(jnp.uint32(7), "msaa8")
    fn = jax.jit(functools.partial(
        pf.render_frame_megakernel,
        width=cfg.width, height=cfg.height, cfg=cfg,
    ))

    def run(f):
        return fn(baked, bdpt_frame=jnp.uint32(f), pixel_jitter=jit)[1]

    for i in range(warmup):
        r = run(i)
    float(r[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        r = run(i)
    float(r[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(width=1280, height=720, depth=3):
    import numpy as np

    from fyp_bidirectionalpathtracer_tpu.accel import pallas_frame as pf
    from fyp_bidirectionalpathtracer_tpu.models.procedural import (
        cornell_box,
        textured_room,
    )
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig,
        RenderConfig,
    )

    cfg = RenderConfig(width=width, height=height,
                       bdpt=BDPTConfig(max_depth=depth))

    corn = Scene.from_built(cornell_box(), aspect=width / height).bake()
    print(json.dumps({"scene": "cornell-34", "ms": round(time_mk(corn, cfg), 2)}),
          flush=True)

    built = textured_room()
    for m in built.materials:
        m.base_color_image = None
    flat = Scene.from_built(built, aspect=width / height).bake()
    assert tuple(flat.data.textures.data.shape[:2]) == (1, 1)
    print(json.dumps({"scene": "room-342-untextured",
                      "ms": round(time_mk(flat, cfg), 2)}), flush=True)

    # textured kernel with the replay stubbed out (kernel + splat only)
    from benchmarks.tex_mk_breakdown import _stub_replay

    room = Scene.from_built(textured_room(), aspect=width / height).bake()
    real = pf._textured_replay
    pf._textured_replay = _stub_replay
    try:
        print(json.dumps({"scene": "room-342-textured-stub",
                          "ms": round(time_mk(room, cfg), 2)}), flush=True)
    finally:
        pf._textured_replay = real


if __name__ == "__main__":
    main()
