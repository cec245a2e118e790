"""Deferred-texture replay decomposition on the real chip.

tex_mk_breakdown measured replay = full - stub = 165.7 ms on the textured
room (342 tris, 8 MB packed atlas, 720p d=3) — yet gather_tier_micro says
the 7 packed taps (6.45M indices, 16-col f32, 8 MB table) should cost only
~55-70 ms.  This times the replay STANDALONE over a materialized kernel
`out` (accel/pallas_frame._frame_out) and decomposes it:

  full    - _textured_replay as shipped
  notaps  - sample_or_constant patched to return the constant (ratio math,
            transposes and accumulation chain only)
  taps    - just the 7 sample_or_constant taps on the same rows

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/replay_micro.py
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
    float(jnp.asarray(r, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.asarray(r, jnp.float32).ravel()[0])
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
    atlas = baked.data.textures
    bcfg = cfg.bdpt
    jit = gbuffer_mod.pixel_jitter_for_frame(jnp.uint32(7), "msaa8")

    fo = jax.jit(functools.partial(
        pf._frame_out, width=width, height=height, cfg=cfg))
    out, n_sub, n_pix, sub_h, textured, _ = fo(
        baked, bdpt_frame=jnp.uint32(7), pixel_jitter=jit)
    out = jax.block_until_ready(out)
    float(out.ravel()[0])  # honest materialization
    print(json.dumps({"out_rows": int(out.shape[0]),
                      "out_mb": round(out.size * 4 / 1e6, 1)}), flush=True)

    def replay_sum(o):
        res4, splats, r1, em3 = pf._textured_replay(
            o, n_sub, n_pix, bcfg, atlas, width)
        s = res4.sum() + r1.sum() + em3.sum()
        for lin, rgb, a in splats:
            s = s + rgb.sum() + a.sum() + lin.sum().astype(jnp.float32)
        return s

    ms_full = _time(jax.jit(replay_sum), (out,))
    print(json.dumps({"ms_replay_full": round(ms_full, 2)}), flush=True)

    real = tex_mod.sample_or_constant_fm
    tex_mod.sample_or_constant_fm = (
        lambda atlas, slot, u, v, constant, static_used=True: constant)
    try:
        ms_notaps = _time(jax.jit(replay_sum), (out,))
    finally:
        tex_mod.sample_or_constant_fm = real
    print(json.dumps({"ms_replay_notaps": round(ms_notaps, 2)}), flush=True)

    d_max = bcfg.max_depth
    n_e2 = d_max if bcfg.enable_light_tracing else 0
    gb = 4 + 5 * n_e2
    xt = gb + pf.N_GBUF_ROWS

    def taps_sum(o):
        flat = o.reshape(o.shape[0], -1)[:, :n_sub]
        ones4 = jnp.ones((n_sub, 4), jnp.float32)
        bases = [xt + 7 * (k - 1) for k in range(1, d_max + 1)]
        bases += [xt + 7 * d_max + 7 * (k - 1) for k in range(1, d_max + 1)]
        s = jnp.float32(0.0)
        for base in bases:
            uv = flat[base:base + 2].T
            slot = flat[base + 2].astype(jnp.int32)
            s = s + tex_mod.sample_or_constant(
                atlas, slot, uv, ones4, static_used=atlas.any_base).sum()
        em_slot = flat[xt + 14 * d_max].astype(jnp.int32)
        uv1 = flat[xt:xt + 2].T
        s = s + tex_mod.sample_or_constant(
            atlas, em_slot, uv1, ones4,
            static_used=atlas.any_emissive).sum()
        return s

    ms_taps = _time(jax.jit(taps_sum), (out,))
    print(json.dumps({"ms_taps_only": round(ms_taps, 2)}), flush=True)

    def taps_fm_sum(o):
        flat = o.reshape(o.shape[0], -1)[:, :n_sub]
        ones4 = jnp.ones((4, n_sub), jnp.float32)
        bases = [xt + 7 * (k - 1) for k in range(1, d_max + 1)]
        bases += [xt + 7 * d_max + 7 * (k - 1) for k in range(1, d_max + 1)]
        s = jnp.float32(0.0)
        for base in bases:
            slot = flat[base + 2].astype(jnp.int32)
            s = s + tex_mod.sample_or_constant_fm(
                atlas, slot, flat[base], flat[base + 1], ones4,
                static_used=atlas.any_base).sum()
        em_slot = flat[xt + 14 * d_max].astype(jnp.int32)
        s = s + tex_mod.sample_or_constant_fm(
            atlas, em_slot, flat[xt], flat[xt + 1], ones4,
            static_used=atlas.any_emissive).sum()
        return s

    ms_taps_fm = _time(jax.jit(taps_fm_sum), (out,))
    print(json.dumps({"ms_taps_fm_only": round(ms_taps_fm, 2)}), flush=True)


if __name__ == "__main__":
    main()
