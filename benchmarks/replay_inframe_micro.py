"""In-frame deferred-replay decomposition (real chip).

replay_micro times _textured_replay STANDALONE reduced to a scalar sum —
XLA cancels the boundary transposes (sum is order-agnostic) and can elide
work a real frame must materialize, so its numbers (29 ms) disagree with
the in-frame replay cost (tex_mk_breakdown: full - stub = 156 ms).  This
times the FULL jitted render_frame_megakernel in three variants:

  full      - as shipped
  notaps    - sample_or_constant_fm patched to return the constant
              (in-frame ratio math + transposes + channel integration,
              no texture gathers)
  stubrep   - _textured_replay patched to the gather-free stub
              (= tex_mk_breakdown's stub; kernel + splat + channels)

taps-in-frame = full - notaps; replay-math-in-frame = notaps - stubrep.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/replay_inframe_micro.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp


def _time(fn, args, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(r[1][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(r[1][0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(width=1280, height=720, depth=3):
    from fyp_bidirectionalpathtracer_tpu.accel import pallas_frame as pf
    from fyp_bidirectionalpathtracer_tpu.models.procedural import (
        textured_room,
    )
    from fyp_bidirectionalpathtracer_tpu.ops import texture as tex_mod
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
    jit = gbuffer_mod.pixel_jitter_for_frame(jnp.uint32(7), "msaa8")

    def run(tag):
        ms = _time(fn, (baked,), )
        print(json.dumps({tag: round(ms, 2)}), flush=True)
        return ms

    fn = jax.jit(lambda baked: pf.render_frame_megakernel(
        baked, width, height, jnp.uint32(7), jit, cfg))
    run("ms_full")

    real = tex_mod.sample_or_constant_fm
    tex_mod.sample_or_constant_fm = (
        lambda atlas, slot, u, v, constant, static_used=True: constant)
    try:
        fn = jax.jit(lambda baked: pf.render_frame_megakernel(
            baked, width, height, jnp.uint32(7), jit, cfg))
        run("ms_notaps")
    finally:
        tex_mod.sample_or_constant_fm = real

    def stub_replay(out, n_sub, n_pix, bcfg, atlas, width):
        d_max = bcfg.max_depth
        n_e2 = d_max if bcfg.enable_light_tracing else 0
        flat = out.reshape(out.shape[0], -1)[:, :n_sub]
        res4 = flat[0:4].T
        splats = []
        for i in range(n_e2):
            base = 4 + 5 * i
            splats.append((flat[base].astype(jnp.int32),
                           flat[base + 1:base + 4].T, flat[base + 4]))
        ones3 = jnp.ones((n_sub, 3), jnp.float32)
        return res4, splats, ones3, ones3

    real_rep = pf._textured_replay
    pf._textured_replay = stub_replay
    try:
        fn = jax.jit(lambda baked: pf.render_frame_megakernel(
            baked, width, height, jnp.uint32(7), jit, cfg))
        run("ms_stubreplay")
    finally:
        pf._textured_replay = real_rep


if __name__ == "__main__":
    main()
