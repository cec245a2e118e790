"""Stage timing for the megakernel frame: kernel-only vs +splat vs full
pipeline, and splat-mode comparison."""
import functools
import time

import jax
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gmod
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig, RenderConfig
from fyp_bidirectionalpathtracer_tpu.accel.pallas_frame import render_frame_megakernel

W, H = 1280, 720


def timeit(fn, sync, iters=15):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    baked = Scene.from_built(cornell_box(), aspect=W / H).bake()
    frame = jnp.uint32(0x1337)
    jit = gmod.pixel_jitter_for_frame(frame, "msaa8")

    variants = {
        "full (default auto)": BDPTConfig(),
        "e2 direct": BDPTConfig(splat_mode="direct"),
        "e2 sorted": BDPTConfig(splat_mode="sorted"),
        "e2 packed": BDPTConfig(splat_mode="packed"),
        "e2 complex": BDPTConfig(splat_mode="complex"),
        "no e2 (kernel only)": BDPTConfig(enable_light_tracing=False),
        "e1 only": BDPTConfig(enable_light_tracing=False,
                              enable_connections=False),
    }
    out = [None]
    for tag, bcfg in variants.items():
        cfg = RenderConfig(width=W, height=H, bdpt=bcfg)

        @jax.jit
        def run(f):
            ch, img = render_frame_megakernel(
                baked, W, H, f, jit, cfg, interpret=False
            )
            return img

        def fn():
            out[0] = run(frame)

        dt = timeit(fn, lambda: float(out[0][0, 0, 0]))
        print(f"{tag:24s}: {dt:7.2f} ms  (mean {float(out[0][..., :3].mean()):.4f})",
              flush=True)


if __name__ == "__main__":
    main()
