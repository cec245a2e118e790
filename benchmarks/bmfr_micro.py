"""BMFR stage timing at 720p on TPU: preprocess / regression / postprocess
marginal costs over the base frame."""
import functools
import time

import jax
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
    BDPT_FRAME_INIT,
    GBUF_FRAME_INIT,
    render_frame_fn,
)
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BMFRConfig, RenderConfig

W, H = 1280, 720


def timeit(fn, sync, iters=10):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    baked = Scene.from_built(cornell_box(), aspect=W / H).bake()
    variants = {
        "denoise off": BMFRConfig(enabled=False),
        "pre+post": BMFRConfig(enabled=True, regression=False),
        "pre only": BMFRConfig(enabled=True, regression=False,
                               postprocess=False),
        "pre+post+QR": BMFRConfig(enabled=True, regression=True),
    }
    out = [None]
    for tag, bm in variants.items():
        cfg = RenderConfig(width=W, height=H, bmfr=bm)
        fn = jax.jit(functools.partial(render_frame_fn, cfg=cfg))
        accum = AccumState.create(H, W)
        bmfr = BMFRState.create(H, W)

        def run(fn=fn, accum=accum, bmfr=bmfr):
            ch, a2, b2 = fn(
                baked, baked.data.camera, accum, bmfr,
                jnp.uint32(GBUF_FRAME_INIT), jnp.uint32(BDPT_FRAME_INIT),
                jnp.asarray(False),
            )
            out[0] = ch["PipelineOutput"]

        dt = timeit(run, lambda: float(out[0][0, 0, 0]))
        print(f"{tag:14s}: {dt:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
