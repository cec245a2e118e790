"""Ray-traced G-buffer pass (LightProbeGBufferPass rebuild).

One wavefront of primary rays per pixel, thin-lens optional, env-map miss.
Channel layout matches the reference exactly
(lightProbeGBuffer.rt.hlsl:93-110):
  WorldPosition       = (posW, 1) valid / (*, 0) miss
  WorldNormal         = (N, dist to camera)
  MaterialDiffuse     = (diffuse, opacity); miss -> (env color, 1)
  MaterialSpecRough   = (specular, linearRoughness)
  MaterialExtraParams = (IoR, lightmap rgb=0)
  Emissive            = (emissive, 0)
Primary rays cull backfaces (RAY_FLAG_CULL_BACK_FACING_TRIANGLES,
lightProbeGBuffer.rt.hlsl:152).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng, samplers
from ..core.vecmath import normalize
from ..ops.envmap import eval_env_nearest
from ..scene.camera import camera_ray_dirs


def pixel_jitter_for_frame(frame_count, mode: str = "msaa8"):
    """The pass's subpixel jitter in [0,1]^2 pixel units.

    msaa8 matches LightProbeGBufferPass.cpp:131-140 / BDPTPass.cpp:97-102:
    offset = kMSAA[frame % 8] / 16, jitter = offset + 0.5.
    """
    if mode == "none":
        return jnp.asarray([0.5, 0.5], jnp.float32)
    if mode == "msaa8":
        return samplers.msaa8_jitter(frame_count) + 0.5
    if mode == "random":
        seed = rng.tea_init(jnp.asarray(frame_count, jnp.uint32), jnp.uint32(0xDEAD))
        seed, u0, u1 = rng.next_rand2(seed)
        return jnp.stack([u0, u1])
    raise ValueError(mode)


def ray_traced_gbuffer(
    baked,
    trace,
    width: int,
    height: int,
    frame_count,
    pixel_jitter,
    use_thin_lens: bool = False,
    lens_radius=0.0,
    focal_len=1.0,
    row0=0,
    sub_height: int | None = None,
    env_bilinear: bool = False,
):
    """Returns the channel dict. `trace` from ops.shading.make_shaded_tracer
    (closest hit + shading data in one wavefront call).

    row0/sub_height render only rows [row0, row0+sub_height) of the full
    width x height image with global pixel semantics (jitter NDC + RNG
    seeds) — the shard_map row-sharded path (parallel.sharding)."""
    cam = baked.data.camera
    d_raw = camera_ray_dirs(cam, width, height, pixel_jitter,
                            row0=row0, sub_height=sub_height)

    if use_thin_lens:
        seeds = rng.pixel_seeds(width, height, frame_count,
                                row0=row0, sub_height=sub_height)
        focal_pt = cam.pos_w + focal_len * d_raw
        seeds, lx, ly = samplers.lens_sample(seeds, lens_radius)
        u_n = normalize(cam.camera_u)
        v_n = normalize(cam.camera_v)
        origin = (
            cam.pos_w
            + lx[..., None] * u_n
            + ly[..., None] * v_n
        )
        direction = normalize(focal_pt - origin)
    else:
        origin = jnp.broadcast_to(cam.pos_w, d_raw.shape)
        direction = normalize(d_raw)

    hit, sd = trace(
        origin,
        direction,
        0.0,
        jnp.broadcast_to(cam.pos_w, d_raw.shape),
        cull_backface=True,
    )
    if getattr(baked, "has_normal_maps", False):
        # primary hits get the full prepareShadingData treatment
        # (Shading.slang:135-157); bounces keep the simple path
        from ..ops.shading import apply_normal_mapping

        sd = apply_normal_mapping(baked, hit, sd)
    valid = hit.hit
    vmask = valid[..., None]
    dist = jnp.sqrt(jnp.sum((sd.pos_w - cam.pos_w) ** 2, -1))
    if env_bilinear:
        from ..ops.envmap import eval_env_bilinear

        env = eval_env_bilinear(baked.data.env_map, direction)
    else:
        env = eval_env_nearest(baked.data.env_map, direction)

    zeros3 = jnp.zeros_like(sd.pos_w)
    channels = {
        "WorldPosition": jnp.concatenate(
            [jnp.where(vmask, sd.pos_w, 0.0), valid[..., None].astype(jnp.float32)],
            -1,
        ),
        "WorldNormal": jnp.concatenate(
            [jnp.where(vmask, sd.n, 0.0), jnp.where(valid, dist, 0.0)[..., None]], -1
        ),
        "MaterialDiffuse": jnp.concatenate(
            [
                jnp.where(vmask, sd.diffuse, env),
                jnp.where(valid, sd.opacity, 1.0)[..., None],
            ],
            -1,
        ),
        "MaterialSpecRough": jnp.concatenate(
            [
                jnp.where(vmask, sd.specular, 0.0),
                jnp.where(valid, sd.linear_roughness, 0.0)[..., None],
            ],
            -1,
        ),
        "MaterialExtraParams": jnp.concatenate(
            [
                jnp.where(valid, sd.ior, 0.0)[..., None],
                jnp.zeros(valid.shape + (3,), jnp.float32),
            ],
            -1,
        ),
        "Emissive": jnp.concatenate(
            [jnp.where(vmask, sd.emissive, zeros3), jnp.zeros(valid.shape + (1,))], -1
        ),
    }
    return channels
