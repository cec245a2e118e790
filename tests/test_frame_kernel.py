"""Equivalence tests for the whole-frame BDPT megakernel
(accel/pallas_frame.py) against the per-bounce wavefront
(passes.gbuffer + passes.bdpt), interpret mode on CPU.

The two paths draw identical RNG sequences; residual differences come from
closest-hit winner ties on triangle edges (different intersection op
orders), so the comparisons are statistical: a small fraction of tie pixels
may differ arbitrarily, everything else must agree tightly.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.accel.pallas_frame import (
    render_frame_megakernel,
    supports_megakernel,
)
from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.passes import bdpt as bdpt_mod
from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gbuffer_mod
from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig, RenderConfig

W, H = 64, 48


@pytest.fixture(scope="module")
def cornell():
    return Scene.from_built(cornell_box(), aspect=W / H).bake()


def _run_both(cornell, bdpt_cfg: BDPTConfig):
    cfg = RenderConfig(width=W, height=H, bdpt=bdpt_cfg)
    assert supports_megakernel(cornell, cfg)
    frame = jnp.uint32(0x1337)
    jit = gbuffer_mod.pixel_jitter_for_frame(frame, "msaa8")
    ch_mk, img_mk = render_frame_megakernel(
        cornell, W, H, frame, jit, cfg, interpret=True
    )
    trace = make_shaded_tracer(cornell)
    ch = gbuffer_mod.ray_traced_gbuffer(
        cornell, trace, W, H, jnp.uint32(0xDEADBEEF), jit
    )
    img = bdpt_mod.bdpt_pass(
        cornell, cornell.intersector(), ch, frame, jit, bdpt_cfg, trace=trace
    )
    return ch_mk, np.asarray(img_mk), ch, np.asarray(img)


def test_megakernel_matches_wavefront_default(cornell):
    ch_mk, img_mk, ch, img = _run_both(cornell, BDPTConfig())
    # G-buffer channels: tight agreement except edge-tie pixels
    for key in ("WorldPosition", "WorldNormal", "MaterialDiffuse",
                "MaterialSpecRough", "Emissive"):
        d = np.abs(np.asarray(ch_mk[key]) - np.asarray(ch[key])).max(-1)
        frac = (d > 1e-3).mean()
        assert frac < 0.01, (key, frac)
    d = np.abs(img_mk - img).max(-1)
    assert (d > 1e-3).mean() < 0.08, (d > 1e-3).mean()
    assert np.abs(img_mk - img).mean() < 0.02
    # radiance statistics must agree closely (unbiasedness of the whole frame)
    assert abs(img_mk[..., :3].mean() - img[..., :3].mean()) < 5e-3


@pytest.mark.parametrize(
    "bcfg",
    [
        BDPTConfig(enable_light_tracing=False, enable_connections=False),
        BDPTConfig(enable_connections=False),
        BDPTConfig(enable_light_tracing=False),
        BDPTConfig(max_depth=2),
        BDPTConfig(mat_model=1),
        BDPTConfig(faithful_rng=True),
        BDPTConfig(reference_quirks=False),
        BDPTConfig(connection_weight="power"),
        BDPTConfig(connection_weight="balance", reference_quirks=False),
        # kernel-side rgb8e splat packing + prepacked compacted reduction
        # (the TPU production splat path, forced on under interpret)
        BDPTConfig(splat_mode="tiled_rgb8e"),
    ],
    ids=["e1-only", "no-e3", "no-e2", "depth2", "lambertian",
         "faithful-rng", "no-quirks", "power-mis", "balance-mis",
         "rgb8e-packed-splat"],
)
@pytest.mark.slow
def test_megakernel_matches_wavefront_variants(cornell, bcfg):
    _, img_mk, _, img = _run_both(cornell, bcfg)
    d = np.abs(img_mk - img).max(-1)
    assert (d > 1e-3).mean() < 0.08, (d > 1e-3).mean()
    assert np.abs(img_mk - img).mean() < 0.02
    assert abs(img_mk[..., :3].mean() - img[..., :3].mean()) < 5e-3


@pytest.mark.slow
def test_megakernel_thin_lens_matches_wavefront(cornell):
    """Thin-lens primary rays (lens origin from the G-buffer RNG stream,
    direction through the focal point) must match the wavefront path."""
    from fyp_bidirectionalpathtracer_tpu.utils.config import GBufferConfig

    gcfg = GBufferConfig(use_thin_lens=True, f_stop=8.0, focal_length_gui=1.5)
    cfg = RenderConfig(width=W, height=H, bdpt=BDPTConfig(), gbuffer=gcfg)
    assert supports_megakernel(cornell, cfg)
    frame = jnp.uint32(0x1337)
    gframe = jnp.uint32(0xDEADBEEF)
    jit = gbuffer_mod.pixel_jitter_for_frame(frame, "msaa8")
    ch_mk, img_mk = render_frame_megakernel(
        cornell, W, H, frame, jit, cfg, interpret=True, gbuf_frame=gframe
    )
    trace = make_shaded_tracer(cornell)
    lens_radius = gcfg.focal_length_gui / (2.0 * gcfg.f_stop)
    ch = gbuffer_mod.ray_traced_gbuffer(
        cornell, trace, W, H, gframe, jit, use_thin_lens=True,
        lens_radius=lens_radius, focal_len=gcfg.focal_length_gui,
    )
    img = bdpt_mod.bdpt_pass(
        cornell, cornell.intersector(), ch, frame, jit, cfg.bdpt, trace=trace
    )
    img_mk, img = np.asarray(img_mk), np.asarray(img)
    for key in ("WorldPosition", "WorldNormal"):
        d = np.abs(np.asarray(ch_mk[key]) - np.asarray(ch[key])).max(-1)
        assert (d > 1e-3).mean() < 0.02, (key, (d > 1e-3).mean())
    d = np.abs(img_mk - img).max(-1)
    assert (d > 1e-3).mean() < 0.08
    assert abs(img_mk[..., :3].mean() - img[..., :3].mean()) < 5e-3


def test_megakernel_in_pipeline(cornell):
    """render_frame_fn with megakernel='on' runs the full frame (interpret)
    and produces the same accumulated output statistics as 'off'."""
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT,
        GBUF_FRAME_INIT,
        render_frame_fn,
    )

    outs = {}
    for mode in ("on", "off"):
        cfg = RenderConfig(width=W, height=H, bdpt=BDPTConfig(megakernel=mode))
        fn = functools.partial(render_frame_fn, cfg=cfg)
        accum = AccumState.create(H, W)
        bmfr = BMFRState.create(H, W)
        ch, accum, bmfr = fn(
            cornell, cornell.data.camera, accum, bmfr,
            jnp.uint32(GBUF_FRAME_INIT), jnp.uint32(BDPT_FRAME_INIT),
            jnp.asarray(False),
        )
        outs[mode] = np.asarray(ch["PipelineOutput"])
        assert set(ch) >= {
            "WorldPosition", "WorldNormal", "MaterialDiffuse",
            "MaterialSpecRough", "MaterialExtraParams", "Emissive",
            "BDPT", "Accumulated", "PipelineOutput",
        }
    d = np.abs(outs["on"] - outs["off"]).max(-1)
    assert (d > 1e-3).mean() < 0.08
    assert np.abs(outs["on"] - outs["off"]).mean() < 0.02
