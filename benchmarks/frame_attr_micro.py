"""Cornell frame attribution for the round-5 splat/misc hunt (VERDICT r4
item 1): in-frame differencing of the production frame against stubbed
variants, plus the est-2 dead-update fraction the sort currently carries.

Variants (all the SAME render_frame_fn jit as bench.py, honest sync):
  full      — production defaults (splat_mode auto -> tiled_rgb8e)
  sortonly  — splat reduced to sort only (kernel+decode delta)
  skip      — splat DCE'd (sort+kernel delta)
  raw       — _frame_out only: megakernel pallas_call + out materialization
              (everything bench-side minus splat minus channel/accum glue)

Dead fraction: est-2 updates whose gate (pre_ok & vis) failed carry the
sentinel pixel id (passes/bdpt.py / pallas_frame splat rows); counted
from the megakernel's pix rows (live = pix < n_pix) in either the 5-row
or the packed 2-row splat layout.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/frame_attr_micro.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

W, H, DEPTH = 1280, 720, 3


def _time(step, warmup=3, iters=15):
    out = None
    for i in range(warmup):
        out = step(i)
    float(jnp.asarray(out[0]).reshape(-1)[0])  # honest device sync
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        out = step(i)
    float(jnp.asarray(out[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


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
    from fyp_bidirectionalpathtracer_tpu.accel import pallas_frame as pf
    from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gbuffer_mod

    baked = Scene.from_built(cornell_box(), aspect=W / H).bake()
    reset = jnp.asarray(False)

    # ---- dead-update fraction (one kernel launch, read ok rows) ----
    cfg0 = RenderConfig(width=W, height=H, bdpt=BDPTConfig(max_depth=DEPTH))

    @jax.jit
    def ok_fracs(frame):
        jitter = gbuffer_mod.pixel_jitter_for_frame(
            frame, cfg0.gbuffer.jitter_mode)
        out, n_sub, n_pix, sub_h, _, _, packed = pf._frame_out(
            baked, W, H, frame, jitter, cfg0)
        stride = 2 if packed else 5
        fr = []
        for i in range(DEPTH):
            pix = out[4 + stride * i].reshape(-1)[:n_sub]
            fr.append(jnp.mean((pix < n_pix).astype(jnp.float32)))
        return jnp.stack(fr)

    fr = [round(float(x), 4) for x in ok_fracs(jnp.uint32(BDPT_FRAME_INIT))]
    print(json.dumps({"live_frac_per_depth": fr,
                      "live_frac_total": round(sum(fr) / len(fr), 4)}),
          flush=True)

    # ---- raw kernel-output variant ----
    @jax.jit
    def raw_step(frame):
        jitter = gbuffer_mod.pixel_jitter_for_frame(
            frame, cfg0.gbuffer.jitter_mode)
        out, *_ = pf._frame_out(baked, W, H, frame, jitter, cfg0)
        return (out,)

    ms = _time(lambda i: raw_step(jnp.uint32(BDPT_FRAME_INIT + i)))
    print(json.dumps({"variant": "raw_kernel_out", "ms": round(ms, 2)}),
          flush=True)

    # ---- full-frame variants ----
    for mode in ["auto", "tiled_sortonly", "skip"]:
        cfg = RenderConfig(
            width=W, height=H,
            bdpt=BDPTConfig(max_depth=DEPTH, splat_mode=mode),
        )
        fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))
        accum = AccumState.create(H, W)
        bmfr = BMFRState.create(H, W)
        state = {"accum": accum, "bmfr": bmfr}

        def step(i, state=state, fn=fn):
            ch, accum, bmfr = fn(baked, baked.data.camera, state["accum"],
                                 state["bmfr"],
                                 jnp.uint32(GBUF_FRAME_INIT + i),
                                 jnp.uint32(BDPT_FRAME_INIT + i), reset)
            state["accum"], state["bmfr"] = accum, bmfr
            return (ch["PipelineOutput"],)

        ms = _time(step)
        print(json.dumps({"variant": f"frame[{mode}]", "ms": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
