"""Material model API: evalDirect / evalBRDF / evalPdf / sampleBRDF.

Vectorized re-expression of MaterialUtils.hlsli:87-329.  Two models,
dispatched by a *static* `mat_model` (0 = GGX diffuse+specular, 1 =
Lambertian) — the analogue of the reference's gMatIndex uniform; changing it
recompiles instead of branching per-thread.

Numeric-hazard policy: the reference divides blindly (e.g. D*G*F/(4*NdotV))
and relies on isnan guards at accumulation time (BDPTMain.rt.hlsl:165,198,
229).  We preserve those inf/nan flows bit-for-bit and leave the guarding to
the estimator, so masked lanes (e.g. zero-initialized path vertices) behave
exactly like the reference's.

RNG: every sampler returns the advanced seed.  NOTE the reference's
sampleBRDF takes its seed *by value* (MaterialUtils.hlsli:130), so the HLSL
never advances the caller's seed across bounces — every bounce of a subpath
redraws the same 3 numbers.  passes.bdpt reproduces that under
`faithful_rng=True` by discarding the returned seed; the default pipeline
threads it properly.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng
from ..core.samplers import cos_hemisphere_sample, ggx_microfacet_sample
from ..core.vecmath import M_1_PI, M_PI, dot, luminance, normalize, saturate
from ..scene.lights import eval_light
from .brdf import ggx_lighting, ggx_normal_distribution, ggx_schlick_masking, schlick_fresnel

GGX = 0
LAMBERTIAN = 1


def clamp_vec(v, upper):
    """Per-channel clamp to [0, gClampUpper] (MaterialUtils.hlsli:15-18)."""
    return jnp.clip(v, 0.0, upper)


def probability_to_sample_diffuse(dif, spec):
    """Lobe pick probability by luminance ratio (MaterialUtils.hlsli:22-27)."""
    lum_d = jnp.maximum(0.01, luminance(dif))
    lum_s = jnp.maximum(0.01, luminance(spec))
    return lum_d / (lum_d + lum_s)


def pick_light(seed, light_count):
    """index = min(int(u * N), N-1) (BDPTUtils.hlsli:142)."""
    seed, u = rng.next_rand(seed)
    idx = jnp.minimum(
        (u * light_count.astype(jnp.float32)).astype(jnp.int32), light_count - 1
    )
    return seed, idx


# --------------------------------------------------------------------- GGX
def eval_ggx_brdf(v, l, n, no_normal_n, dif, spec, rough, is_specular):
    """evalGGXBRDF (MaterialUtils.hlsli:186-207)."""
    below = dot(no_normal_n, l) <= 0.0
    diffuse = dif * M_1_PI
    h = normalize(l + v)
    n_dot_l = saturate(dot(n, l))
    n_dot_v = saturate(dot(n, v))
    spec_col, _ = ggx_lighting(h, l, n, n_dot_l, n_dot_v, rough, spec)
    out = jnp.where(is_specular[..., None], spec_col, diffuse)
    return jnp.where(below[..., None], 0.0, out)


def eval_ggx_pdf(v, l, n, no_normal_n, dif, spec, rough, is_specular):
    """evalGGXPdf (MaterialUtils.hlsli:254-279)."""
    prob_diffuse = probability_to_sample_diffuse(dif, spec)
    below = dot(no_normal_n, l) <= 0.0
    n_dot_l = saturate(dot(n, l))
    pdf_diffuse = (n_dot_l * M_1_PI) * prob_diffuse
    h = normalize(l + v)
    n_dot_v = saturate(dot(n, v))
    _, ggx_prob = ggx_lighting(h, l, n, n_dot_l, n_dot_v, rough, spec)
    pdf_spec = ggx_prob * (1.0 - prob_diffuse)
    out = jnp.where(is_specular, pdf_spec, pdf_diffuse)
    return jnp.where(below, 0.0, out)


def sample_ggx_brdf(seed, n, no_normal_n, v, dif, spec, rough):
    """sampleGGXBRDF (MaterialUtils.hlsli:209-252).

    Returns (seed, weight [...,3], L [...,3], pdf [...], is_specular [...]).
    `weight` is f*NdotL/pdf as in the reference (dif/probDiffuse for the
    diffuse lobe; NdotL*ggxTerm/pdf for the specular lobe).

    RNG parity: the HLSL draws 1 lobe-choice number then exactly 2 more in
    either branch; we draw the same 3 and feed the latter 2 to both samplers.
    """
    prob_diffuse = probability_to_sample_diffuse(dif, spec)
    seed, u_lobe = rng.next_rand(seed)
    choose_diffuse = u_lobe < prob_diffuse
    n_dot_v = saturate(dot(n, v))

    # Both branches consume the same 2 draws.
    seed_d, l_diff = cos_hemisphere_sample(seed, n)
    _, h = ggx_microfacet_sample(seed, rough, n)
    seed = seed_d
    l_spec = normalize(2.0 * dot(v, h)[..., None] * h - v)

    l = jnp.where(choose_diffuse[..., None], l_diff, l_spec)
    below = dot(no_normal_n, l) <= 0.0
    n_dot_l = saturate(dot(n, l))

    # diffuse branch
    pdf_diff = (n_dot_l * M_1_PI) * prob_diffuse
    w_diff = dif / prob_diffuse[..., None]

    # specular branch
    ggx_term, ggx_prob = ggx_lighting(h, l_spec, n, n_dot_l, n_dot_v, rough, spec)
    pdf_spec = ggx_prob * (1.0 - prob_diffuse)
    w_spec = (n_dot_l / (ggx_prob * (1.0 - prob_diffuse)))[..., None] * ggx_term

    pdf = jnp.where(choose_diffuse, pdf_diff, pdf_spec)
    weight = jnp.where(choose_diffuse[..., None], w_diff, w_spec)
    pdf = jnp.where(below, 0.0, pdf)
    weight = jnp.where(below[..., None], 0.0, weight)
    is_specular = ~choose_diffuse
    return seed, weight, l, pdf, is_specular


def nee_pick(seed, lights, pos):
    """The light-pick + light-eval half of evalDirect (1 rand consumed).
    Returns (seed, l, intensity, dist) — the shadow query follows."""
    seed, idx = pick_light(seed, lights.count)
    l, intensity, dist, _ = eval_light(lights, idx, pos)
    return seed, l, intensity, dist


def ggx_direct_shade(vis, l, intensity, n, v, dif, spec, rough, light_count):
    """The shading half of ggxDirect given visibility (MaterialUtils:160-183)."""
    n_dot_l = saturate(dot(n, l))
    shadow_mult = jnp.where(vis, light_count.astype(jnp.float32), 0.0)
    h = normalize(v + l)
    n_dot_h = saturate(dot(n, h))
    l_dot_h = saturate(dot(l, h))
    n_dot_v = saturate(dot(n, v))
    d = ggx_normal_distribution(n_dot_h, rough)
    g = ggx_schlick_masking(n_dot_l, n_dot_v, rough)
    f = schlick_fresnel(spec, l_dot_h)
    # NdotL cancelled against the denominator exactly as in the reference.
    ggx_term = f * (d * g / (4.0 * n_dot_v))[..., None]
    return shadow_mult[..., None] * intensity * (
        ggx_term + (n_dot_l[..., None] * dif) * M_1_PI
    )


def lambertian_direct_shade(vis, l, intensity, n, dif, light_count):
    """The shading half of lambertianDirect (MaterialUtils:299-306)."""
    l_dot_n = saturate(dot(n, l))
    shadow_mult = jnp.where(vis, light_count.astype(jnp.float32), 0.0)
    return (shadow_mult * l_dot_n)[..., None] * intensity * dif / M_PI


def nee_shade(vis, l, intensity, n, v, dif, spec, rough, light_count, mat_model: int):
    if mat_model == GGX:
        return ggx_direct_shade(vis, l, intensity, n, v, dif, spec, rough, light_count)
    return lambertian_direct_shade(vis, l, intensity, n, dif, light_count)


def ggx_direct(seed, shadow_fn, lights, min_t, pos, n, v, dif, spec, rough):
    """ggxDirect: one-light NEE with xN compensation (MaterialUtils:149-184)."""
    seed, l, intensity, dist = nee_pick(seed, lights, pos)
    vis = shadow_fn(pos, l, min_t, dist)
    return seed, ggx_direct_shade(vis, l, intensity, n, v, dif, spec, rough, lights.count)


# --------------------------------------------------------------- Lambertian
def eval_lambertian_brdf(dif):
    """evalLambertianBRDF returns the albedo (MaterialUtils.hlsli:309-314)
    (note: the reference omits the 1/pi here; kept for parity)."""
    return dif


def eval_lambertian_pdf(n, l):
    return saturate(dot(n, l) * M_1_PI)


def sample_lambertian_brdf(seed, n, dif):
    seed, l = cos_hemisphere_sample(seed, n)
    pdf = saturate(dot(n, l)) * M_1_PI
    return seed, dif, l, pdf, jnp.zeros(pdf.shape, bool)


def lambertian_direct(seed, shadow_fn, lights, min_t, pos, n, dif):
    """lambertianDirect (MaterialUtils.hlsli:288-307)."""
    seed, l, intensity, dist = nee_pick(seed, lights, pos)
    vis = shadow_fn(pos, l, min_t, dist)
    return seed, lambertian_direct_shade(vis, l, intensity, n, dif, lights.count)


# ----------------------------------------------------------------- dispatch
def eval_brdf(v, l, n, no_normal_n, dif, spec, rough, is_specular, mat_model: int):
    if mat_model == GGX:
        return eval_ggx_brdf(v, l, n, no_normal_n, dif, spec, rough, is_specular)
    return eval_lambertian_brdf(dif)


def eval_pdf(v, l, n, no_normal_n, dif, spec, rough, is_specular, mat_model: int):
    if mat_model == GGX:
        return eval_ggx_pdf(v, l, n, no_normal_n, dif, spec, rough, is_specular)
    return eval_lambertian_pdf(n, l)


def sample_brdf(seed, n, no_normal_n, v, dif, spec, rough, mat_model: int):
    if mat_model == GGX:
        return sample_ggx_brdf(seed, n, no_normal_n, v, dif, spec, rough)
    return sample_lambertian_brdf(seed, n, dif)


def eval_direct(seed, shadow_fn, lights, min_t, pos, n, v, dif, spec, rough, mat_model: int):
    if mat_model == GGX:
        return ggx_direct(seed, shadow_fn, lights, min_t, pos, n, v, dif, spec, rough)
    return lambertian_direct(seed, shadow_fn, lights, min_t, pos, n, dif)
