"""Deferred-texture megakernel breakdown on the real chip.

Times, at 1280x720 d=3 on the textured room:
  full      - render_frame_megakernel (kernel + replay + splat + channels)
  stub      - same with _textured_replay monkeypatched to a gather-free
              stub (kernel + splat + channels; no texture taps/ratio math)
  replay    - full - stub (the deferred-texture tap + ratio cost)
  wavefront - the per-bounce wavefront path (defer_textures=False)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/tex_mk_breakdown.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp


def _stub_replay(out, n_sub, n_pix, bcfg, atlas, width):
    """Gather-free stand-in with _textured_replay's exact return shape."""
    d_max = bcfg.max_depth
    n_e2 = d_max if bcfg.enable_light_tracing else 0
    flat = out.reshape(out.shape[0], -1)[:, :n_sub]
    res4 = flat[0:4].T
    splats = []
    for i in range(n_e2):
        base = 4 + 5 * i
        lin = flat[base].astype(jnp.int32)
        rgb = flat[base + 1:base + 4].T
        splats.append((lin, rgb, flat[base + 4]))
    ones3 = jnp.ones((n_sub, 3), jnp.float32)
    return res4, splats, ones3, ones3


def main(width=1280, height=720, depth=3, warmup=2, iters=5):
    from fyp_bidirectionalpathtracer_tpu.accel import pallas_frame as pf
    from fyp_bidirectionalpathtracer_tpu.models.procedural import textured_room
    from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gbuffer_mod
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig,
        RenderConfig,
    )

    cfg = RenderConfig(width=width, height=height,
                       bdpt=BDPTConfig(max_depth=depth, defer_textures=True))
    baked = Scene.from_built(textured_room(), aspect=width / height).bake()
    assert pf.supports_megakernel(baked, cfg)
    atlas = baked.data.textures
    print("atlas data", atlas.data.shape,
          "packed", None if atlas.packed is None else atlas.packed.shape,
          flush=True)

    jit = gbuffer_mod.pixel_jitter_for_frame(jnp.uint32(7), "msaa8")

    def timeit(fn, sync):
        for i in range(warmup):
            r = fn(i)
        sync(r)
        t0 = time.perf_counter()
        for i in range(warmup, warmup + iters):
            r = fn(i)
        sync(r)
        return (time.perf_counter() - t0) / iters * 1e3

    full = jax.jit(functools.partial(
        pf.render_frame_megakernel, width=width, height=height, cfg=cfg,
    ))
    ms_full = timeit(
        lambda f: full(baked, bdpt_frame=jnp.uint32(f), pixel_jitter=jit)[1],
        lambda img: float(img[0, 0, 0]),
    )
    print("full", ms_full, flush=True)

    real_replay = pf._textured_replay
    pf._textured_replay = _stub_replay
    try:
        stub = jax.jit(functools.partial(
            pf.render_frame_megakernel, width=width, height=height, cfg=cfg,
        ))
        ms_stub = timeit(
            lambda f: stub(
                baked, bdpt_frame=jnp.uint32(f), pixel_jitter=jit)[1],
            lambda img: float(img[0, 0, 0]),
        )
    finally:
        pf._textured_replay = real_replay
    print("stub", ms_stub, flush=True)

    cfg_wf = RenderConfig(
        width=width, height=height,
        bdpt=BDPTConfig(max_depth=depth, defer_textures=False),
    )
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT,
        GBUF_FRAME_INIT,
        render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState

    wf = jax.jit(functools.partial(render_frame_fn, cfg=cfg_wf))
    accum = AccumState.create(height, width)
    bmfr = BMFRState.create(height, width)
    reset = jnp.asarray(False)

    def run_wf(i):
        ch, a, b = wf(baked, baked.data.camera, accum, bmfr,
                      jnp.uint32(GBUF_FRAME_INIT + i),
                      jnp.uint32(BDPT_FRAME_INIT + i), reset)
        return ch["PipelineOutput"]

    ms_wf = timeit(run_wf, lambda img: float(img[0, 0, 0]))

    print(json.dumps({
        "ms_full": round(ms_full, 2),
        "ms_stub_kernel_splat": round(ms_stub, 2),
        "ms_replay": round(ms_full - ms_stub, 2),
        "ms_wavefront": round(ms_wf, 2),
    }))


if __name__ == "__main__":
    main()
