"""Rendering pipeline driver — the RenderingPipeline/Sample analogue.

The reference's pass list (Main.cpp:15-18):
  LightProbeGBufferPass -> BDPTPass -> SimpleAccumulationPass -> BMFR Denoise
Here each pass is a pure function over a channel dict; the driver owns the
mutable bits the reference kept in pass members: frame counters (G-buffer
seeds from 0xDEADBEEF, LightProbeGBufferPass.h; BDPT from 0x1337,
BDPTPass.h:40), accumulation state, BMFR history, camera animation, and the
camera-move accumulation reset (RenderingPipeline.cpp:611-688 frame flow).

The whole frame is one jitted function: XLA sees G-buffer + BDPT +
accumulation (+ BMFR) as a single fused program — no per-pass host sync,
which is the TPU-native replacement for the reference's command-list
recording.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..passes import bdpt as bdpt_mod
from ..passes import bmfr as bmfr_mod
from ..passes import gbuffer as gbuffer_mod
from ..passes.accumulate import AccumState, accumulate, camera_moved
from ..ops import tonemap as tonemap_mod
from ..scene.camera import begin_frame, derive_camera, make_camera
from ..scene.scene import BakedScene
from ..utils.config import RenderConfig

GBUF_FRAME_INIT = 0xDEADBEEF   # LightProbeGBufferPass seed origin
BDPT_FRAME_INIT = 0x1337       # BDPTPass.h:40


@dataclass
class RenderState:
    """Everything mutable across frames (checkpointable)."""

    accum: AccumState
    bmfr: "bmfr_mod.BMFRState"
    frame_index: int = 0
    time: float = 0.0


def render_frame_fn(
    baked: BakedScene,
    camera,
    accum: AccumState,
    bmfr_state,
    gbuf_frame,
    bdpt_frame,
    reset,
    cfg: RenderConfig,
):
    """One full frame (jittable; cfg static). Returns (channels, accum, bmfr,
    raw_bdpt)."""
    from ..accel.pallas_frame import render_frame_megakernel, supports_megakernel
    from ..ops.shading import make_shaded_tracer

    scene = baked.with_camera(camera)
    jitter = gbuffer_mod.pixel_jitter_for_frame(bdpt_frame, cfg.gbuffer.jitter_mode)

    mk = cfg.bdpt.megakernel
    use_mk = (
        mk != "off"
        and supports_megakernel(scene, cfg)
        and (mk == "on" or jax.default_backend() == "tpu")
    )
    if (not use_mk and mk == "auto" and jax.default_backend() == "tpu"
            and cfg.bdpt.connection_weight != "uniform"):
        # corrected MIS runs in-kernel for untextured scenes (round 5);
        # only deferred-TEXTURE scenes still fall back to the wavefront
        # (their replay bakes the uniform 1/totalLength into the
        # post-kernel clamp) — say so instead of silently routing
        import logging

        logging.getLogger(__name__).warning(
            "connection_weight=%r on a textured scene routes this frame "
            "to the per-bounce wavefront (the deferred-texture megakernel "
            "supports 'uniform' only); expect ~2x the megakernel frame "
            "time", cfg.bdpt.connection_weight,
        )
    if use_mk:
        channels, frame_img = render_frame_megakernel(
            scene, cfg.width, cfg.height, bdpt_frame, jitter, cfg,
            interpret=None if mk == "auto" else jax.default_backend() != "tpu",
            gbuf_frame=gbuf_frame,
        )
    else:
        intersect = scene.intersector()
        trace = make_shaded_tracer(scene, sort_divergent=cfg.bdpt.sort_bounces,
                                   bounce_tex_mean=cfg.bdpt.bounce_tex_mean)

        lens_radius = (
            cfg.gbuffer.focal_length_gui / (2.0 * cfg.gbuffer.f_stop)
            if cfg.gbuffer.use_thin_lens
            else 0.0
        )
        channels = gbuffer_mod.ray_traced_gbuffer(
            scene,
            trace,
            cfg.width,
            cfg.height,
            gbuf_frame,
            jitter,
            use_thin_lens=cfg.gbuffer.use_thin_lens,
            lens_radius=lens_radius,
            focal_len=cfg.gbuffer.focal_length_gui,
            env_bilinear=cfg.gbuffer.env_bilinear,
        )

        frame_img = bdpt_mod.bdpt_pass(
            scene, intersect, channels, bdpt_frame, jitter, cfg.bdpt, trace=trace
        )
        channels["BDPT"] = frame_img

    accum, accum_img = accumulate(
        accum, frame_img, cfg.accumulate.max_accum_count, reset=reset
    )
    channels["Accumulated"] = accum_img

    bmfr_state, denoised = bmfr_mod.bmfr_pass(
        bmfr_state, channels, camera, cfg.bmfr
    )
    channels["PipelineOutput"] = denoised
    return channels, accum, bmfr_state


class Renderer:
    """Progressive renderer over a baked scene (Sample::renderFrame loop)."""

    def __init__(self, baked: BakedScene, config: RenderConfig, mesh=None):
        self.baked = baked
        self.cfg = config
        self.camera = derive_camera(
            baked.data.camera.replace(aspect=jnp.asarray(config.width / config.height, jnp.float32))
        )
        self.state = RenderState(
            accum=AccumState.create(config.height, config.width),
            bmfr=bmfr_mod.BMFRState.create(config.height, config.width),
        )
        self._prev_view_proj = self.camera.view_proj
        if mesh is not None:
            from ..accel.pallas_frame import supports_megakernel
            from ..parallel import sharding

            if (
                not config.bmfr.enabled
                and config.bdpt.megakernel != "off"
                and supports_megakernel(baked, config)
            ):
                # per-shard Pallas megakernel + splat psum over the mesh
                self._fn = sharding.sharded_megakernel_step(config, mesh)
            elif not config.bmfr.enabled and config.height % mesh.devices.size == 0:
                # per-shard wavefront with the Pallas intersectors intact
                self._fn = sharding.sharded_wavefront_step(config, mesh)
            else:
                # annotation-based SPMD: XLA partitions gathers globally
                # (required for BMFR's cross-row reprojection taps) but
                # sheds the Pallas kernels
                self._fn = sharding.sharded_render_step(
                    functools.partial(render_frame_fn, cfg=config),
                    mesh, config.height,
                )
        else:
            self._fn = jax.jit(
                functools.partial(render_frame_fn, cfg=config),
            )
        self.channels: dict = {}

    # -- camera control ------------------------------------------------
    def set_camera_pose(self, pos, target, up=(0, 1, 0)):
        self.camera = begin_frame(
            self.camera.replace(
                pos_w=jnp.asarray(pos, jnp.float32),
                target=jnp.asarray(target, jnp.float32),
                up=jnp.asarray(up, jnp.float32),
            )
        )

    def animate(self, dt: float):
        """Advance the active camera path and any object paths
        (Scene::update semantics, Scene.cpp:106-125)."""
        host = self.baked.host
        advanced = False
        if host.camera_paths:
            self.state.time += dt * host.camera_speed
            advanced = True
            pos, tgt, up = host.camera_paths[0].sample(self.state.time)
            self.set_camera_pose(pos, tgt, up)
        if getattr(host, "object_paths", None):
            if not advanced:
                self.state.time += dt * host.camera_speed
            if host.update_objects(self.state.time):
                # geometry moved: re-bake (the DXR BLAS-refit analogue);
                # shapes are unchanged so the jitted frame fn does not
                # retrace — only the scene arrays are swapped
                cam = self.camera
                self.baked = host.bake(
                    max_lights=int(self.baked.data.lights.pos_w.shape[0])
                )
                self.camera = cam

    # -- frame loop ------------------------------------------------------
    def render_frame(self):
        reset = camera_moved(self._prev_view_proj, self.camera.view_proj)
        self.channels, accum, bmfr_state = self._fn(
            self.baked,
            self.camera,
            self.state.accum,
            self.state.bmfr,
            jnp.uint32(GBUF_FRAME_INIT + self.state.frame_index),
            jnp.uint32(BDPT_FRAME_INIT + self.state.frame_index),
            reset,
        )
        self.state.accum = accum
        self.state.bmfr = bmfr_state
        self.state.frame_index += 1
        self._prev_view_proj = self.camera.view_proj
        # roll prevViewProj for next frame's reprojection
        self.camera = begin_frame(self.camera)
        return self.channels["PipelineOutput"]

    def render_frame_profiled(self, prof):
        """One frame with per-pass Profiler events (the RenderingPipeline
        ProfilerEvent-per-pass analogue, RenderingPipeline.cpp:666-682).

        The production frame is ONE fused jit (render_frame_fn), so per-pass
        attribution requires running the stages as separate jitted calls
        with an honest device sync (scalar readback — see utils.profiler)
        after each.  Stage boundaries prevent some cross-pass fusion, so the
        per-pass sum usually runs a little above the fused frame time; it is
        an attribution estimate, exactly like the reference's per-pass GPU
        timestamp scraping (extractProfilingData).
        """
        cfg = self.cfg
        if not hasattr(self, "_stage_fns"):
            from ..accel.pallas_frame import render_frame_megakernel, supports_megakernel
            from ..ops.shading import make_shaded_tracer

            use_mk = (
                cfg.bdpt.megakernel != "off"
                and supports_megakernel(self.baked, cfg)
                and (cfg.bdpt.megakernel == "on" or jax.default_backend() == "tpu")
            )

            def mk_stage(baked, camera, gbuf_frame, bdpt_frame):
                scene = baked.with_camera(camera)
                jitter = gbuffer_mod.pixel_jitter_for_frame(
                    bdpt_frame, cfg.gbuffer.jitter_mode)
                return render_frame_megakernel(
                    scene, cfg.width, cfg.height, bdpt_frame, jitter, cfg,
                    interpret=None if cfg.bdpt.megakernel == "auto"
                    else jax.default_backend() != "tpu",
                    gbuf_frame=gbuf_frame,
                )

            def gbuf_stage(baked, camera, gbuf_frame, bdpt_frame):
                scene = baked.with_camera(camera)
                jitter = gbuffer_mod.pixel_jitter_for_frame(
                    bdpt_frame, cfg.gbuffer.jitter_mode)
                trace = make_shaded_tracer(
                    scene, sort_divergent=cfg.bdpt.sort_bounces)
                lens_radius = (
                    cfg.gbuffer.focal_length_gui / (2.0 * cfg.gbuffer.f_stop)
                    if cfg.gbuffer.use_thin_lens else 0.0)
                return gbuffer_mod.ray_traced_gbuffer(
                    scene, trace, cfg.width, cfg.height, gbuf_frame, jitter,
                    use_thin_lens=cfg.gbuffer.use_thin_lens,
                    lens_radius=lens_radius,
                    focal_len=cfg.gbuffer.focal_length_gui,
                    env_bilinear=cfg.gbuffer.env_bilinear,
                )

            def bdpt_stage(baked, camera, channels, bdpt_frame):
                scene = baked.with_camera(camera)
                jitter = gbuffer_mod.pixel_jitter_for_frame(
                    bdpt_frame, cfg.gbuffer.jitter_mode)
                trace = make_shaded_tracer(
                    scene, sort_divergent=cfg.bdpt.sort_bounces,
                    bounce_tex_mean=cfg.bdpt.bounce_tex_mean)
                return bdpt_mod.bdpt_pass(
                    scene, scene.intersector(), channels, bdpt_frame, jitter,
                    cfg.bdpt, trace=trace)

            def accum_stage(accum, frame_img, reset):
                return accumulate(
                    accum, frame_img, cfg.accumulate.max_accum_count,
                    reset=reset)

            def bmfr_stage(bmfr_state, channels, camera):
                return bmfr_mod.bmfr_pass(bmfr_state, channels, camera,
                                          cfg.bmfr)

            self._stage_fns = {
                "use_mk": use_mk,
                "megakernel": jax.jit(mk_stage),
                "gbuffer": jax.jit(gbuf_stage),
                "bdpt": jax.jit(bdpt_stage),
                "accumulate": jax.jit(accum_stage),
                "bmfr": jax.jit(bmfr_stage),
            }

        st = self._stage_fns
        reset = camera_moved(self._prev_view_proj, self.camera.view_proj)
        gbuf_frame = jnp.uint32(GBUF_FRAME_INIT + self.state.frame_index)
        bdpt_frame = jnp.uint32(BDPT_FRAME_INIT + self.state.frame_index)
        with prof.event("frame") as fh:
            if st["use_mk"]:
                with prof.event("megakernel") as h:
                    channels, frame_img = st["megakernel"](
                        self.baked, self.camera, gbuf_frame, bdpt_frame)
                    h[0] = frame_img
            else:
                with prof.event("gbuffer") as h:
                    channels = st["gbuffer"](
                        self.baked, self.camera, gbuf_frame, bdpt_frame)
                    h[0] = channels
                with prof.event("bdpt") as h:
                    frame_img = st["bdpt"](
                        self.baked, self.camera, channels, bdpt_frame)
                    h[0] = frame_img
                channels["BDPT"] = frame_img
            with prof.event("accumulate") as h:
                accum, accum_img = st["accumulate"](
                    self.state.accum, frame_img, reset)
                h[0] = accum_img
            channels["Accumulated"] = accum_img
            with prof.event("bmfr") as h:
                bmfr_state, denoised = st["bmfr"](
                    self.state.bmfr, channels, self.camera)
                h[0] = denoised
            channels["PipelineOutput"] = denoised
            fh[0] = denoised
        self.channels = channels
        self.state.accum = accum
        self.state.bmfr = bmfr_state
        self.state.frame_index += 1
        self._prev_view_proj = self.camera.view_proj
        self.camera = begin_frame(self.camera)
        return denoised

    def render(self, n_frames: int):
        out = None
        for _ in range(n_frames):
            out = self.render_frame()
        return out

    def display(self, channel: str = "PipelineOutput"):
        """Tone-mapped 8-bit-ready image (SimpleToneMappingPass analogue)."""
        img = self.channels[channel][..., :3]
        op = tonemap_mod.OPERATOR_NAMES[self.cfg.tone_map_operator]
        return tonemap_mod.tone_map(img, op)


def make_cornell_renderer(size: int = 256, **cfg_kw) -> Renderer:
    """Convenience: Cornell-box renderer (BASELINE config 1)."""
    from ..models.procedural import cornell_box
    from ..scene.scene import Scene

    cfg = RenderConfig(width=size, height=size, **cfg_kw)
    baked = Scene.from_built(cornell_box(), aspect=1.0).bake()
    return Renderer(baked, cfg)
