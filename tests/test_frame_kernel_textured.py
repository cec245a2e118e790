"""Deferred-texture megakernel (accel/pallas_frame.py textured mode) vs the
per-bounce wavefront, interpret mode on CPU.

The kernel shades with each material's MEAN base color (baked into the
constant — scene.Scene.bake) and emits raw per-estimator monomial parts plus
per-vertex (uv, slot, lobe) records; the texel/mean ratios, clamps and the
reference's accumulation order replay post-kernel
(pallas_frame._textured_replay).

Two accepted deviations vs the wavefront (both unbiased):
  * probabilityToSampleDiffuse (MaterialUtils.hlsli:22-27) sees the mean
    rather than the texel albedo, so diffuse-lobe throughputs differ by the
    p(mean)/p(texel) ratio (~1% with the 0.01 luminance floors) — the
    estimator stays unbiased because the weight divides by the SAME p that
    sampled the lobe.
  * closest-hit winner ties on triangle edges (different op orders), the
    same residual the untextured megakernel tests carry.
Hence: a UNIFORM texture (texel == mean) must match at the untextured tie
rate, and real textures must match in radiance statistics + tight bounds on
large per-pixel deviations.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fyp_bidirectionalpathtracer_tpu.accel.pallas_frame import (
    render_frame_megakernel,
    supports_megakernel,
)
from fyp_bidirectionalpathtracer_tpu.models.procedural import textured_room
from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
from fyp_bidirectionalpathtracer_tpu.passes import bdpt as bdpt_mod
from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gbuffer_mod
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig, RenderConfig

W, H = 64, 48


@pytest.fixture(scope="module")
def room():
    return Scene.from_built(textured_room(), aspect=W / H).bake()


def _run_both(baked, bcfg: BDPTConfig):
    # deferred texturing is opt-in (default off on perf grounds; config.py)
    bcfg = dataclasses.replace(bcfg, defer_textures=True)
    cfg = RenderConfig(width=W, height=H, bdpt=bcfg)
    assert supports_megakernel(baked, cfg)
    frame = jnp.uint32(0x1337)
    jit = gbuffer_mod.pixel_jitter_for_frame(frame, "msaa8")
    ch_mk, img_mk = render_frame_megakernel(
        baked, W, H, frame, jit, cfg, interpret=True
    )
    trace = make_shaded_tracer(baked)
    ch = gbuffer_mod.ray_traced_gbuffer(
        baked, trace, W, H, jnp.uint32(0xDEADBEEF), jit
    )
    img = bdpt_mod.bdpt_pass(
        baked, baked.intersector(), ch, frame, jit, bcfg, trace=trace
    )
    return ch_mk, np.asarray(img_mk), ch, np.asarray(img)


def test_scene_qualifies(room):
    """textured_room is base-color-only -> deferred texturing applies."""
    assert room.tex_defer_ok
    cfg_on = RenderConfig(
        width=W, height=H, bdpt=BDPTConfig(defer_textures=True)
    )
    assert supports_megakernel(room, cfg_on)
    # but NOT when deferral is off (the default — perf grounds, config.py)
    assert not supports_megakernel(room, RenderConfig(width=W, height=H))


@pytest.mark.slow
def test_textured_megakernel_matches_wavefront(room):
    ch_mk, img_mk, ch, img = _run_both(room, BDPTConfig(max_depth=3))
    # G-buffer channels carry texel values (ratio/emissive fix-up)
    for key in ("WorldPosition", "WorldNormal", "MaterialDiffuse",
                "MaterialSpecRough", "Emissive"):
        d = np.abs(np.asarray(ch_mk[key]) - np.asarray(ch[key])).max(-1)
        assert (d > 1e-3).mean() < 0.01, (key, (d > 1e-3).mean())
    d = np.abs(img_mk - img).max(-1)
    # ties + the p(mean)/p(texel) throughput deviation
    assert (d > 1e-2).mean() < 0.10, (d > 1e-2).mean()
    assert np.abs(img_mk - img).mean() < 0.02
    assert abs(img_mk[..., :3].mean() - img[..., :3].mean()) < 5e-3


@pytest.mark.parametrize(
    "bcfg",
    [
        BDPTConfig(max_depth=2, enable_light_tracing=False,
                   enable_connections=False),
        BDPTConfig(max_depth=2, enable_path_tracing=False,
                   enable_connections=False),
        BDPTConfig(max_depth=2, enable_path_tracing=False,
                   enable_light_tracing=False),
        BDPTConfig(max_depth=2, reference_quirks=False),
    ],
    ids=["e1-only", "e2-only", "e3-only", "no-quirks"],
)
@pytest.mark.slow
def test_textured_megakernel_estimators(room, bcfg):
    _, img_mk, _, img = _run_both(room, bcfg)
    d = np.abs(img_mk - img).max(-1)
    assert (d > 1e-2).mean() < 0.10, (d > 1e-2).mean()
    assert np.abs(img_mk - img).mean() < 0.02
    assert abs(img_mk[..., :3].mean() - img[..., :3].mean()) < 5e-3


def test_uniform_texture_is_exact():
    """texel == mean everywhere -> deferred ratios are exactly 1 and the
    lobe probabilities coincide; only tie pixels may differ."""
    built = textured_room()
    for m in built.materials:
        if m.base_color_image is not None:
            m.base_color_image = np.full_like(
                np.asarray(m.base_color_image), 0.62
            )
    baked = Scene.from_built(built, aspect=W / H).bake()
    assert baked.tex_defer_ok
    _, img_mk, _, img = _run_both(baked, BDPTConfig(max_depth=2))
    d = np.abs(img_mk - img).max(-1)
    assert (d > 1e-3).mean() < 0.06, (d > 1e-3).mean()
    assert abs(img_mk[..., :3].mean() - img[..., :3].mean()) < 2e-3


def test_emissive_textured_replay_and_combined_fallback():
    """ADVICE r2: a scene texturing >=2 kinds (base + emissive) builds ONLY
    the u8-quantized combined table (TextureAtlas.packed is None), so the
    wavefront shades from u8-quantized taps while the deferred replay
    samples the f32 atlas through the 4-gather fallback — this pins the em3
    replay path and bounds the u8-vs-f32 route divergence (PARITY.md)."""
    from fyp_bidirectionalpathtracer_tpu.models.procedural import checkerboard

    built = textured_room()
    # LDR emissive texture on the glow material (the reference's emissive
    # textures are LDR images scaled by gEmitMult, so [0,1] is the real
    # range; the u8 combined table clamps anything above 1 — PARITY.md)
    glow = built.materials[3]
    glow.emissive = (1.0, 0.9, 0.7)
    glow.emissive_image = checkerboard(32, (1.0, 0.9, 0.7), (0.4, 0.35, 0.2), 4)
    baked = Scene.from_built(built, aspect=W / H).bake()
    assert baked.tex_defer_ok
    atlas = baked.data.textures
    assert atlas.combined is not None and atlas.packed is None
    assert atlas.any_base and atlas.any_emissive

    ch_mk, img_mk, ch, img = _run_both(baked, BDPTConfig(max_depth=2))
    # Emissive G-buffer channel must carry the texture (not the constant):
    em_mk = np.asarray(ch_mk["Emissive"])[..., :3]
    em_wf = np.asarray(ch["Emissive"])[..., :3]
    assert em_wf.std() > 0.01  # the map actually varies across the panel
    d = np.abs(em_mk - em_wf).max(-1)
    # wavefront taps are u8-quantized, replay taps are f32: allow the
    # quantization tier plus bilinear accumulation (~4/255)
    assert (d > 0.02).mean() < 0.02, (d > 0.02).mean()
    d = np.abs(img_mk - img).max(-1)
    assert (d > 2e-2).mean() < 0.10, (d > 2e-2).mean()
    assert np.abs(img_mk - img).mean() < 0.02
    assert abs(img_mk[..., :3].mean() - img[..., :3].mean()) < 5e-3
