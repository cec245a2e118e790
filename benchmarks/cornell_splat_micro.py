"""Cornell full-pipeline frame time per splat_mode (the round-3/4 splat
decomposition table in BASELINE.md).

Times the SAME jitted path as bench.py (render_frame_fn: G-buffer + BDPT +
accumulation, denoise off) so the numbers are in-frame honest, not
standalone-micro lies (CLAUDE.md).  Honest sync = scalar readback.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/cornell_splat_micro.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

W, H, DEPTH = 1280, 720, 3

MODES = ["tiled", "tiled_bf16w", "tiled_rgb8e", "tiled_sortonly", "skip"]


def main():
    from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT,
        GBUF_FRAME_INIT,
        render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig,
        RenderConfig,
    )

    baked = Scene.from_built(cornell_box(), aspect=W / H).bake()
    reset = jnp.asarray(False)

    for mode in MODES:
        cfg = RenderConfig(
            width=W, height=H,
            bdpt=BDPTConfig(max_depth=DEPTH, splat_mode=mode),
        )
        fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))
        accum = AccumState.create(H, W)
        bmfr = BMFRState.create(H, W)

        def step(i, accum, bmfr):
            return fn(baked, baked.data.camera, accum, bmfr,
                      jnp.uint32(GBUF_FRAME_INIT + i),
                      jnp.uint32(BDPT_FRAME_INIT + i), reset)

        for i in range(3):
            ch, accum, bmfr = step(i, accum, bmfr)
        float(ch["PipelineOutput"][0, 0, 0])
        t0 = time.perf_counter()
        iters = 15
        for i in range(3, 3 + iters):
            ch, accum, bmfr = step(i, accum, bmfr)
        float(ch["PipelineOutput"][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        mean = float(ch["PipelineOutput"][..., :3].mean())
        print(json.dumps({"splat_mode": mode,
                          "ms_per_frame": round(dt * 1e3, 2),
                          "mean": round(mean, 5)}), flush=True)


if __name__ == "__main__":
    main()
