"""Reusable shading passes beyond the BDPT app's pipeline — rebuilds of the
reference's CommonPasses library (SURVEY.md §2.3): ambient occlusion,
Lambertian + shadows, one-bounce diffuse GI, copy-to-output, and the
tone-mapping pass wrapper.  Each consumes the shared G-buffer channels.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng
from ..core.samplers import cos_hemisphere_sample
from ..core.vecmath import dot, normalize, saturate
from ..ops import materials as mat
from ..ops import tonemap as tonemap_mod


def ambient_occlusion_pass(
    baked, intersect, channels, frame_count, num_rays: int = 32,
    ao_radius: float | None = None, min_t: float = 1e-4,
):
    """AmbientOcclusionPass (aoTracing.rt.hlsl): N cosine-distributed rays
    within gAORadius; output = visible fraction."""
    pos4 = channels["WorldPosition"]
    norm4 = channels["WorldNormal"]
    h, w = pos4.shape[0], pos4.shape[1]
    valid = pos4[..., 3] != 0.0
    if ao_radius is None:
        lo = jnp.min(baked.data.geometry.positions, axis=0)
        hi = jnp.max(baked.data.geometry.positions, axis=0)
        ao_radius = 0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2))
    seed = rng.pixel_seeds(w, h, frame_count)
    vis_sum = jnp.zeros((h, w), jnp.float32)
    for _ in range(num_rays):
        seed, d = cos_hemisphere_sample(seed, norm4[..., :3])
        hit = intersect(pos4[..., :3], d, min_t, t_max=ao_radius, closest=False)
        vis_sum = vis_sum + (~hit.hit).astype(jnp.float32)
    ao = vis_sum / num_rays
    out = jnp.where(valid, ao, 1.0)
    return jnp.stack([out, out, out, jnp.ones_like(out)], -1)


def lambertian_shadows_pass(
    baked, intersect, channels, frame_count, min_t: float = 1e-3,
):
    """LambertianPlusShadowPass (lambertianPlusShadows.rt.hlsl): one shadow
    ray per light, summed Lambertian shading."""
    from ..scene.lights import eval_light

    pos4 = channels["WorldPosition"]
    norm4 = channels["WorldNormal"]
    dif4 = channels["MaterialDiffuse"]
    lights = baked.data.lights
    h, w = pos4.shape[0], pos4.shape[1]
    valid = pos4[..., 3] != 0.0
    shade = jnp.zeros((h, w, 3), jnp.float32)
    n_lights = int(lights.pos_w.shape[0])
    for li in range(n_lights):
        idx = jnp.full((h, w), li, jnp.int32)
        l, inten, dist, _ = eval_light(lights, idx, pos4[..., :3])
        ndl = saturate(dot(norm4[..., :3], l))
        vis = ~intersect(pos4[..., :3], l, min_t, t_max=dist, closest=False).hit
        active = (li < lights.count) & vis
        shade = shade + jnp.where(
            active[..., None], ndl[..., None] * inten, 0.0
        )
    shade = shade * dif4[..., :3] / jnp.pi
    out = jnp.where(valid[..., None], shade, dif4[..., :3])
    return jnp.concatenate([out, jnp.ones((h, w, 1), jnp.float32)], -1)


def diffuse_gi_pass(
    baked, intersect, channels, frame_count, min_t: float = 1e-3,
    mat_model: int = mat.LAMBERTIAN,
):
    """SimpleDiffuseGIPass: direct NEE + ONE cosine-sampled indirect bounce
    with NEE at the secondary hit (tutorial-12 style)."""
    from ..ops.shading import prepare_shading_data

    pos4 = channels["WorldPosition"]
    norm4 = channels["WorldNormal"]
    dif4 = channels["MaterialDiffuse"]
    lights = baked.data.lights
    h, w = pos4.shape[0], pos4.shape[1]
    valid = pos4[..., 3] != 0.0
    pos = pos4[..., :3]
    n = norm4[..., :3]
    dif = dif4[..., :3]
    seed = rng.pixel_seeds(w, h, frame_count)

    def shadow_fn(o, d, tmin, tmax):
        return ~intersect(o, d, tmin, tmax, closest=False).hit

    seed, direct = mat.lambertian_direct(seed, shadow_fn, lights, min_t, pos, n, dif)

    # one indirect bounce
    seed, bounce_dir = cos_hemisphere_sample(seed, n)
    hit = intersect(pos, bounce_dir, min_t, closest=True)
    sd = prepare_shading_data(
        baked.tris, baked.data.materials, baked.data.textures, hit, pos,
        bounce_dir, pos,
    )
    seed, bounce_direct = mat.lambertian_direct(
        seed, shadow_fn, lights, min_t, sd.pos_w, sd.n, sd.diffuse
    )
    # cosine-sampled: f*cos/pdf = albedo -> indirect = albedo * L_direct(hit)
    indirect = jnp.where(hit.hit[..., None], dif * bounce_direct, 0.0)
    out = jnp.where(valid[..., None], direct + indirect, dif)
    return jnp.concatenate([out, jnp.ones((h, w, 1), jnp.float32)], -1)


def probe_lit_pass(baked, intersect, channels, probe, min_t: float = 1e-3):
    """Probe-lit shading: analytic direct lighting (one shadow ray per
    light, Lambertian — lambertianPlusShadows.rt.hlsl) plus pre-integrated
    light-probe IBL (the SceneRenderer probe binding feeding the
    evalMaterial probe overload, Graphics/Scene/SceneRenderer.cpp:114-145 ->
    Shading.slang:330-340).  `probe` is an ops.lightprobe.LightProbe built
    from the scene env map; roughness is decoded from the G-buffer exactly
    like prepareShadingData (sd.roughness = linearRoughness^2,
    Shading.slang:236-237)."""
    from ..ops.lightprobe import eval_probe
    from ..scene.lights import eval_light

    pos4 = channels["WorldPosition"]
    norm4 = channels["WorldNormal"]
    dif4 = channels["MaterialDiffuse"]
    spec4 = channels["MaterialSpecRough"]
    cam = baked.data.camera
    h, w = pos4.shape[0], pos4.shape[1]
    valid = pos4[..., 3] != 0.0
    pos = pos4[..., :3]
    n = norm4[..., :3]
    v = normalize(cam.pos_w - pos)
    lin_rough = jnp.maximum(spec4[..., 3], 0.08)
    roughness = lin_rough * lin_rough

    lights = baked.data.lights
    direct = jnp.zeros((h, w, 3), jnp.float32)
    n_lights = int(lights.pos_w.shape[0])
    for li in range(n_lights):
        idx = jnp.full((h, w), li, jnp.int32)
        l, inten, dist, _ = eval_light(lights, idx, pos)
        ndl = saturate(dot(n, l))
        vis = ~intersect(pos, l, min_t, t_max=dist, closest=False).hit
        active = (li < lights.count) & vis
        direct = direct + jnp.where(
            active[..., None], ndl[..., None] * inten, 0.0
        )
    direct = direct * dif4[..., :3] / jnp.pi

    ambient = eval_probe(probe, n, v, dif4[..., :3], spec4[..., :3], roughness)
    out = jnp.where(valid[..., None], direct + ambient, dif4[..., :3])
    return jnp.concatenate([out, jnp.ones((h, w, 1), jnp.float32)], -1)


def tone_mapping_pass(channels, src: str = "PipelineOutput", operator: str = "clamp"):
    """SimpleToneMappingPass wrapper over ops.tonemap."""
    img = channels[src]
    rgb = tonemap_mod.tone_map(img[..., :3], tonemap_mod.OPERATOR_NAMES[operator])
    return jnp.concatenate([rgb, img[..., 3:4]], -1)


def copy_to_output_pass(channels, src: str):
    """CopyToOutputPass: blit any channel to the output."""
    return channels[src]
