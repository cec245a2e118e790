"""Denoise-on full-pipeline frame time per BMFR history_pack mode.

Times the same jitted path as bench.py's bmfr_ms detail (Cornell 720p d=3,
full BMFR: preprocess + QR regression + postprocess, full screen) with
history_pack in {f32, bf16}, plus pre+post-only (reference default stages).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bmfr_pack_micro.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

W, H, DEPTH = 1280, 720, 3


def run(tag, bmfr_cfg):
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
    cfg = RenderConfig(width=W, height=H, bdpt=BDPTConfig(max_depth=DEPTH),
                       bmfr=bmfr_cfg)
    fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))
    accum = AccumState.create(H, W)
    bmfr = BMFRState.create(H, W)
    reset = jnp.asarray(False)

    def step(i, accum, bmfr):
        return fn(baked, baked.data.camera, accum, bmfr,
                  jnp.uint32(GBUF_FRAME_INIT + i),
                  jnp.uint32(BDPT_FRAME_INIT + i), reset)

    for i in range(3):
        ch, accum, bmfr = step(i, accum, bmfr)
    float(ch["PipelineOutput"][0, 0, 0])
    t0 = time.perf_counter()
    iters = 12
    for i in range(3, 3 + iters):
        ch, accum, bmfr = step(i, accum, bmfr)
    float(ch["PipelineOutput"][0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    mean = float(ch["PipelineOutput"][..., :3].mean())
    print(json.dumps({"config": tag, "ms_per_frame": round(dt * 1e3, 2),
                      "mean": round(mean, 5)}), flush=True)


def main():
    import sys

    from fyp_bidirectionalpathtracer_tpu.utils.config import BMFRConfig

    full = dict(enabled=True, preprocess=True, regression=True,
                postprocess=True, half_screen_debug=False)
    prepost = dict(enabled=True, preprocess=True, regression=False,
                   postprocess=True, half_screen_debug=False)
    half = dict(enabled=True, preprocess=True, regression=True,
                postprocess=True, half_screen_debug=True)
    if "--solver" in sys.argv:
        # round-4 solver sweep: bf16 history fetch fixed, QR vs normal-eq
        run("full_bf16_qr", BMFRConfig(**full, history_pack="bf16",
                                       regression_solver="qr"))
        run("full_bf16_normal", BMFRConfig(**full, history_pack="bf16",
                                           regression_solver="normal"))
        run("half_bf16_normal", BMFRConfig(**half, history_pack="bf16",
                                           regression_solver="normal"))
        return
    run("full_f32", BMFRConfig(**full, history_pack="f32"))
    run("full_bf16", BMFRConfig(**full, history_pack="bf16"))
    run("prepost_f32", BMFRConfig(**prepost, history_pack="f32"))
    run("prepost_bf16", BMFRConfig(**prepost, history_pack="bf16"))


if __name__ == "__main__":
    main()
