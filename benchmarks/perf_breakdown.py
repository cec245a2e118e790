"""Per-stage TPU frame-time breakdown (run on the real chip; honest
device->host sync per measurement block)."""
import functools, time, jax, jax.numpy as jnp, numpy as np
from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import render_frame_fn, GBUF_FRAME_INIT, BDPT_FRAME_INIT
from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
from fyp_bidirectionalpathtracer_tpu.utils.config import RenderConfig, BDPTConfig

W,H = 1280,720
def run(tag, cfg, n=15):
    baked = Scene.from_built(cornell_box(), aspect=W/H).bake()
    fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))
    accum = AccumState.create(H,W); bmfr = BMFRState.create(H,W)
    for i in range(2):
        ch, accum, bmfr = fn(baked, baked.data.camera, accum, bmfr, jnp.uint32(GBUF_FRAME_INIT+i), jnp.uint32(BDPT_FRAME_INIT+i), jnp.asarray(False))
    _ = float(ch["PipelineOutput"][0,0,0])
    t0 = time.perf_counter()
    for i in range(2, 2+n):
        ch, accum, bmfr = fn(baked, baked.data.camera, accum, bmfr, jnp.uint32(GBUF_FRAME_INIT+i), jnp.uint32(BDPT_FRAME_INIT+i), jnp.asarray(False))
    _ = float(ch["PipelineOutput"][0,0,0])
    dt = (time.perf_counter()-t0)/n
    m = float(ch["PipelineOutput"][...,:3].mean())
    print(f"{tag}: {dt*1e3:.1f} ms/frame (mean {m:.4f})", flush=True)

if __name__ == "__main__":
    base = RenderConfig(width=W, height=H)  # denoise off = reference default
    run("default (reference pipeline, denoise off)", base)
    run("sorted splat", base.with_(bdpt=BDPTConfig(splat_mode="sorted")))
    run("-est2", base.with_(bdpt=BDPTConfig(enable_light_tracing=False)))
    run("-est3", base.with_(bdpt=BDPTConfig(enable_connections=False)))
    run("est1 only", base.with_(bdpt=BDPTConfig(enable_light_tracing=False, enable_connections=False)))
    run("+bmfr", base.with_(bmfr=base.bmfr.__class__(enabled=True)))
    run("+bmfr+regression", base.with_(bmfr=base.bmfr.__class__(enabled=True, regression=True)))
