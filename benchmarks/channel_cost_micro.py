"""Cost of materializing the channel dict as jit outputs (real chip).

render_frame_fn returns every named channel ([H, W, 4] layout) like the
reference's ResourceManager textures.  The megakernel emits its rows
field-major, so the G-buffer channels cost a 20-row x n_pix transpose per
frame — paid even when no downstream pass reads them (denoise off).  This
times the full jitted frame returning (a) all channels vs (b) only
PipelineOutput + carry state, to see what channel materialization costs.
"""
import functools
import time

import jax
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
    BDPT_FRAME_INIT,
    GBUF_FRAME_INIT,
    render_frame_fn,
)
from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig, RenderConfig

W, H, D = 1280, 720, 3


def run(tag, fn, accum, bmfr):
    reset = jnp.asarray(False)

    def step(i, accum, bmfr):
        return fn(baked, baked.data.camera, accum, bmfr,
                  jnp.uint32(GBUF_FRAME_INIT + i),
                  jnp.uint32(BDPT_FRAME_INIT + i), reset)

    for i in range(3):
        out, accum, bmfr = step(i, accum, bmfr)
    sync = out["PipelineOutput"] if isinstance(out, dict) else out
    float(sync[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(3, 13):
        out, accum, bmfr = step(i, accum, bmfr)
    sync = out["PipelineOutput"] if isinstance(out, dict) else out
    float(sync[0, 0, 0])
    dt = (time.perf_counter() - t0) / 10
    print(f"{tag}: {dt*1e3:.1f} ms/frame", flush=True)


cfg = RenderConfig(width=W, height=H, bdpt=BDPTConfig(max_depth=D))
baked = Scene.from_built(cornell_box(), aspect=W / H).bake()

full = jax.jit(functools.partial(render_frame_fn, cfg=cfg))


def lean(baked, camera, accum, bmfr, gf, bf, reset):
    ch, accum, bmfr = render_frame_fn(baked, camera, accum, bmfr, gf, bf,
                                      reset, cfg=cfg)
    return {"PipelineOutput": ch["PipelineOutput"]}, accum, bmfr


run("all channels", full, AccumState.create(H, W), BMFRState.create(H, W))
run("output only ", jax.jit(lean), AccumState.create(H, W), BMFRState.create(H, W))
