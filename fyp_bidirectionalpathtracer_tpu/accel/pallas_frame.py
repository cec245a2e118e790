"""Whole-frame BDPT megakernel (ray-in-lanes layout).

ONE pallas_call renders the reference's entire per-pixel program
(BDPTMain.rt.hlsl:42-234 + the G-buffer primary hit of
lightProbeGBuffer.rt.hlsl): primary ray, camera subpath, light subpath, and
all three estimator families, with the scene (triangle pack + light table)
resident in VMEM/SMEM and every intermediate in vector registers — no
HBM round-trips between bounces and no per-stage launch/packing costs,
which dominate the per-bounce wavefront path on small scenes.

Layout: grid cell = S=8 lane-rows x 128 lanes = 1024 pixels.  Per-ray state
lives in [S, 128] f32 tiles (one vreg each); intersection runs per lane-row
as [T_chunk, 128] Baldwin-Weber pair tiles (triangles down sublanes, rays
across lanes) with the winner-attribute fetch as a one-hot MXU matmul —
the layout accel.pallas_lane measured fastest.

Estimator-2 splats write (pixel-id, rgba) rows; the host-side wrapper
scatter-adds them exactly like passes.bdpt (the reference's racy
gOutput[id] RMW, BDPTMain.rt.hlsl:199, stays a deterministic scatter).

Scope (static gating, `supports_megakernel`): untextured materials — a
kernel limitation, NOT a reference behavior: simplePrepareShadingData
(BDPTUtils.hlsli:2-53) samples base/spec/emissive textures at mip 0 at
every path vertex, and per-lane texel gathers do not vectorize on the
TPU, so textured scenes take the wavefront path whose XLA-side packed
gathers do (ops/texture.py).  Also: 1x1 (constant) env probe, pinhole or
thin-lens camera, uniform connection weighting, scene small enough for
VMEM.

RNG parity: the TEA/LCG sequences replicate passes.bdpt draw-for-draw, so
the megakernel and the wavefront produce the same Monte-Carlo estimates up
to fp-fusion rounding (see tests/test_frame_kernel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lane import LANE, _pair_test, chunk_bounds, pack_shaded_tris_lane
from .pallas_subpath import (
    M_1_PI,
    M_PI,
    _next_rand,
    _normalize3,
    _perpendicular,
    _sample_brdf_tiles,
)

S = 8
_BIG = 1e30

# scalar-row layout (scal_ref, SMEM [1, NSCAL])
_C_POS = 0        # 0:3   camera pos
_C_U = 3          # 3:6   cameraU
_C_V = 6          # 6:9   cameraV
_C_W = 9          # 9:12  cameraW
_C_N = 12         # 12:15 normalize(cameraW)
_C_IU2 = 15       # 1/|U|^2
_C_IV2 = 16       # 1/|V|^2
_C_IW2 = 17       # 1/|W|^2
_C_JX = 18        # pixel jitter x
_C_JY = 19        # pixel jitter y
_C_ENV = 20       # 20:23 constant env color
_C_LCNT = 23      # light count (float)
_C_LENSR = 24     # thin-lens radius (0 = pinhole)
_C_FOCAL = 25     # thin-lens focal length
_C_UN = 26        # 26:29 normalize(cameraU)
_C_VN = 29        # 29:32 normalize(cameraV)
NSCAL = 32

# light-row layout (light_ref, SMEM [L_pad, NLROW])
_L_POS = 0        # 0:3
_L_DIR = 3        # 3:6
_L_INT = 6        # 6:9
_L_TYPE = 9
_L_COSO = 10
_L_OPEN = 11
_L_PEN = 12
NLROW = 13

LIGHT_DIRECTIONAL = 1  # scene.types.LIGHT_DIRECTIONAL


# --------------------------------------------------------------- tile math
def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _where3(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _neg3(a):
    return (-a[0], -a[1], -a[2])


def _normed(a):
    return _normalize3(a[0], a[1], a[2], eps=0.0)


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _luminance3(c):
    return 0.2126 * c[0] + 0.7152 * c[1] + 0.0722 * c[2]


def _nan_guard3(c):
    bad = jnp.isnan(c[0]) | jnp.isnan(c[1]) | jnp.isnan(c[2])
    return tuple(jnp.where(bad, 0.0, x) for x in c)


def _clamp3(c, upper):
    return tuple(jnp.clip(x, 0.0, upper) for x in c)


def _acos_approx(x):
    """acos via the Hastings minimax polynomial (Mosaic has no native acos).

    |err| < 7e-5 rad — only used for the spot-light penumbra falloff
    (Lights.slang:88), where the reference's own falloff is already a soft
    artistic ramp.
    """
    ax = jnp.abs(x)
    p = jnp.sqrt(jnp.maximum(0.0, 1.0 - ax)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * -0.0187293))
    )
    return jnp.where(x >= 0.0, p, M_PI - p)


def _pack_rgb8e_tiles(r, g, b):
    """ops.splat_tile._pack_rgb8e on [S,128] tiles: non-negative rgb ->
    one i32 (3x8-bit shared-exponent mantissas + 5-bit exponent).  Inputs
    are post-clamp estimator-2 shades (non-negative by construction)."""
    mx = jnp.maximum(jnp.maximum(r, g), b)
    eb = (pltpu.bitcast(mx, jnp.int32) >> 23) & 0xFF
    e = jnp.clip(eb - 126, -16, 15)
    scale = pltpu.bitcast(((8 - e + 127) << 23).astype(jnp.int32),
                          jnp.float32)
    q = lambda c: jnp.clip(  # noqa: E731
        jnp.round(c * scale), 0.0, 255.0).astype(jnp.int32)
    return q(r) | (q(g) << 8) | (q(b) << 16) | ((e + 16) << 24)


def _tea16(v0, v1):
    """16-round TEA hash on uint32 tiles (BDPTUtils.hlsli:91-103)."""
    s0 = jnp.zeros_like(v0)
    for _ in range(16):
        s0 = s0 + jnp.uint32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + jnp.uint32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + jnp.uint32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + jnp.uint32(0x7E95761E))
        )
    return v0


def _build_onb(n):
    """(tangent, bitangent) matching core.vecmath.build_onb."""
    bx, by, bz = _perpendicular(*n)
    b = _normalize3(bx, by, bz)
    t = (
        b[1] * n[2] - b[2] * n[1],
        b[2] * n[0] - b[0] * n[2],
        b[0] * n[1] - b[1] * n[0],
    )
    return t, b


def _cos_hemisphere(seed, n):
    """core.samplers.cos_hemisphere_sample on tiles (2 draws)."""
    seed, u0 = _next_rand(seed)
    seed, u1 = _next_rand(seed)
    t, b = _build_onb(n)
    r = jnp.sqrt(u0)
    phi = 2.0 * M_PI * u1
    rc = r * jnp.cos(phi)
    rs = r * jnp.sin(phi)
    zc = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))
    d = (
        t[0] * rc + b[0] * rs + n[0] * zc,
        t[1] * rc + b[1] * rs + n[1] * zc,
        t[2] * rc + b[2] * rs + n[2] * zc,
    )
    return seed, d


def _unit_sphere(seed, max_iters=24):
    """core.samplers.unit_sphere_sample on tiles (masked rejection)."""
    shape = seed.shape
    p = (
        jnp.full(shape, 2.0, jnp.float32),
        jnp.full(shape, 2.0, jnp.float32),
        jnp.full(shape, 2.0, jnp.float32),
    )
    done = jnp.zeros(shape, bool)
    for _ in range(max_iters):
        seed_n, x = _next_rand(seed)
        seed_n, y = _next_rand(seed_n)
        seed_n, z = _next_rand(seed_n)
        cand = (x * 2.0 - 1.0, y * 2.0 - 1.0, z * 2.0 - 1.0)
        p = _where3(done, p, cand)
        seed = jnp.where(done, seed, seed_n)
        done = done | (_dot3(p, p) <= 1.0)
    p = _where3(done, p, (jnp.zeros(shape), jnp.zeros(shape), jnp.ones(shape)))
    return seed, p


# ------------------------------------------------------------ GGX eval BRDF
def _ggx_lighting_tiles(h, l, n, n_dot_l, n_dot_v, rough, spec):
    """ops.brdf.ggx_lighting on tiles -> (brdf3, ggx_prob)."""
    n_dot_h = _saturate(_dot3(n, h))
    l_dot_h = _saturate(_dot3(l, h))
    a2 = rough * rough
    dd = (n_dot_h * a2 - n_dot_h) * n_dot_h + 1.0
    d = a2 / jnp.maximum(0.001, dd * dd * M_PI)
    k = rough * rough / 2.0
    g_v = n_dot_v / (n_dot_v * (1.0 - k) + k)
    g_l = n_dot_l / (n_dot_l * (1.0 - k) + k)
    g = g_v * g_l
    f5 = jnp.power(jnp.maximum(0.0, 1.0 - l_dot_h), 5.0)
    scale = d * g / (4.0 * n_dot_l * n_dot_v)
    brdf = tuple((sp + (1.0 - sp) * f5) * scale for sp in spec)
    ggx_prob = d * n_dot_h / (4.0 * l_dot_h)
    return brdf, ggx_prob


def _eval_brdf_tiles(v, l, n, dif, spec, rough, is_spec, mat_model: int):
    """ops.materials.eval_brdf on tiles (no_normal_n == n at path vertices)."""
    if mat_model != 0:  # Lambertian: albedo (reference omits 1/pi)
        return dif
    below = _dot3(n, l) <= 0.0
    h = _normed(_add3(l, v))
    n_dot_l = _saturate(_dot3(n, l))
    n_dot_v = _saturate(_dot3(n, v))
    spec_col, _ = _ggx_lighting_tiles(h, l, n, n_dot_l, n_dot_v, rough, spec)
    diffuse = tuple(c * M_1_PI for c in dif)
    out = _where3(is_spec, spec_col, diffuse)
    return _where3(below, (jnp.zeros_like(rough),) * 3, out)


def _nee_shade_tiles_split(vis, l, inten, n, v, dif, spec, rough, lcnt,
                           mat_model):
    """ops.materials.nee_shade on tiles, split into (diffuse-albedo-linear
    part, specular part) — the one place the estimators mix both lobes
    (ggxDirect sums them, MaterialUtils.hlsli:149-184), so deferred
    texturing needs the dif-linear part separately."""
    n_dot_l = _saturate(_dot3(n, l))
    shadow_mult = jnp.where(vis, lcnt, 0.0)
    zero = jnp.zeros_like(n_dot_l)
    if mat_model != 0:
        difp = tuple(shadow_mult * n_dot_l * ic * dc / M_PI
                     for ic, dc in zip(inten, dif))
        return difp, (zero, zero, zero)
    h = _normed(_add3(v, l))
    n_dot_h = _saturate(_dot3(n, h))
    l_dot_h = _saturate(_dot3(l, h))
    n_dot_v = _saturate(_dot3(n, v))
    a2 = rough * rough
    dd = (n_dot_h * a2 - n_dot_h) * n_dot_h + 1.0
    d = a2 / jnp.maximum(0.001, dd * dd * M_PI)
    k = rough * rough / 2.0
    g = (n_dot_l / (n_dot_l * (1.0 - k) + k)) * (
        n_dot_v / (n_dot_v * (1.0 - k) + k)
    )
    f5 = jnp.power(jnp.maximum(0.0, 1.0 - l_dot_h), 5.0)
    dg4 = d * g / (4.0 * n_dot_v)
    difp = tuple(shadow_mult * ic * n_dot_l * dc * M_1_PI
                 for ic, dc in zip(inten, dif))
    specp = tuple(shadow_mult * ic * (sc + (1.0 - sc) * f5) * dg4
                  for ic, sc in zip(inten, spec))
    return difp, specp


def _nee_shade_tiles(vis, l, inten, n, v, dif, spec, rough, lcnt, mat_model):
    """ops.materials.nee_shade on tiles."""
    difp, specp = _nee_shade_tiles_split(
        vis, l, inten, n, v, dif, spec, rough, lcnt, mat_model
    )
    return tuple(dp + sp for dp, sp in zip(difp, specp))


# -------------------------------------------------------- intersection core
def _trace_rows(tri_ref, bounds, n_tris, o, d, tmin_tiles, cull_backface):
    """Closest-hit + shading-attribute fetch over [S,128] ray tiles.

    Returns dict of [S,128] tiles: hit, t, and the decoded hit attributes
    (pos, n(normalized+flip NOT applied), uv-less constant material fields).
    The per-lane-row pair test + one-hot MXU fetch mirror
    accel.pallas_lane._shaded_kernel.
    """
    res_t, res_id = [], []
    attr_rows = []  # per lane-row: [33, 128] (pack rows 12..44)
    for s in range(S):
        ox, oy, oz = o[0][s:s + 1], o[1][s:s + 1], o[2][s:s + 1]
        dx, dy, dz = d[0][s:s + 1], d[1][s:s + 1], d[2][s:s + 1]
        tmin = tmin_tiles[s:s + 1]
        best_t = jnp.full((1, LANE), _BIG, jnp.float32)
        best_id = jnp.full((1, LANE), -1, jnp.int32)
        for start, size in bounds:
            sl = slice(start, start + size)
            valid, t = _pair_test(
                tri_ref, sl, ox, oy, oz, dx, dy, dz, tmin, best_t, cull_backface
            )
            sub = jax.lax.broadcasted_iota(jnp.int32, (size, LANE), 0)
            tri_ids = sub + start
            valid = valid & (tri_ids < n_tris)
            t_m = jnp.where(valid, t, _BIG)
            col_min = jnp.min(t_m, axis=0, keepdims=True)
            improved = col_min < best_t
            is_min = (t_m == col_min) & valid
            sub_f = sub.astype(jnp.float32)
            first = jnp.min(jnp.where(is_min, sub_f, 1e9), axis=0, keepdims=True)
            pick = (sub_f == first) & is_min
            new_id = jnp.sum(jnp.where(pick, tri_ids, 0), axis=0, keepdims=True)
            best_id = jnp.where(improved, new_id, best_id)
            best_t = jnp.where(improved, col_min, best_t)

        fetched = jnp.zeros((45, LANE), jnp.float32)
        for start, size in bounds:
            sl = slice(start, start + size)
            sub = jax.lax.broadcasted_iota(jnp.int32, (size, LANE), 0)
            local = best_id - start
            pick = ((sub == local) & (local >= 0) & (local < size)).astype(
                jnp.float32
            )
            block = tri_ref[sl, 0:45]
            fetched = fetched + jax.lax.dot_general(
                block, pick, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        res_t.append(best_t)
        res_id.append(best_id)
        attr_rows.append(fetched)

    t_ = jnp.concatenate(res_t, axis=0)
    id_ = jnp.concatenate(res_id, axis=0)

    def attr(k):  # pack row k stacked over lane-rows -> [S, 128]
        return jnp.concatenate([attr_rows[s][k:k + 1] for s in range(S)], axis=0)

    # barycentrics from the fetched BW rows (pack rows 4:12)
    r1 = (attr(4), attr(5), attr(6))
    r2 = (attr(8), attr(9), attr(10))
    u = (_dot3(r1, o) - attr(7)) + t_ * _dot3(r1, d)
    v = (_dot3(r2, o) - attr(11)) + t_ * _dot3(r2, d)
    w = 1.0 - u - v
    hit = id_ >= 0
    hf = hit.astype(jnp.float32)
    u, v, w = u * hf, v * hf, w * hf

    n_raw = (
        w * attr(12) + u * attr(15) + v * attr(18),
        w * attr(13) + u * attr(16) + v * attr(19),
        w * attr(14) + u * attr(17) + v * attr(20),
    )
    pos = _add3(o, _scale3(d, t_))
    return {
        "hit": hit,
        "t": t_,
        "pos": pos,
        "n_raw": n_raw,
        # uv + texture slots feed the deferred-texture records; the one-hot
        # fetch already pulled the rows, so untextured kernels DCE these.
        "uv": (
            w * attr(21) + u * attr(23) + v * attr(25),
            w * attr(22) + u * attr(24) + v * attr(26),
        ),
        "base": (attr(27), attr(28), attr(29), attr(30)),
        "spec": (attr(31), attr(32), attr(33), attr(34)),
        "emissive": (attr(35), attr(36), attr(37)),
        "ior": attr(38),
        "shading_model": attr(39),
        "double_sided": attr(40),
        "bc_tex": attr(41),
        "em_tex": attr(43),
    }


def _occluded_rows(tri_ref, bounds, n_tris, o, d, tmin_tiles, tmax):
    """Any-hit over [S,128] ray tiles -> [S,128] bool occluded."""
    rows = []
    for s in range(S):
        ox, oy, oz = o[0][s:s + 1], o[1][s:s + 1], o[2][s:s + 1]
        dx, dy, dz = d[0][s:s + 1], d[1][s:s + 1], d[2][s:s + 1]
        tmin = tmin_tiles[s:s + 1]
        tmx = tmax[s:s + 1]
        hit = jnp.zeros((1, LANE), jnp.float32)
        for start, size in bounds:
            sl = slice(start, start + size)
            valid, _ = _pair_test(
                tri_ref, sl, ox, oy, oz, dx, dy, dz, tmin, tmx, False
            )
            sub = jax.lax.broadcasted_iota(jnp.int32, (size, LANE), 0)
            valid = valid & ((sub + start) < n_tris)
            hit = hit + jnp.sum(valid.astype(jnp.float32), axis=0, keepdims=True)
        rows.append(hit)
    return jnp.concatenate(rows, axis=0) > 0.0


def _decode_shading(tr, view_origin, mat_model_unused=None):
    """ShadingData decode on tiles (ops.shading.shading_from_fields,
    untextured: constants only). Returns dict of tiles."""
    b0, b1, b2, b3 = tr["base"]
    s0, s1, s2, s3 = tr["spec"]
    metal_rough = tr["shading_model"] == 0.0  # SHADING_METAL_ROUGH
    metal = s2
    dif = _where3(
        metal_rough,
        (b0 * (1.0 - metal), b1 * (1.0 - metal), b2 * (1.0 - metal)),
        (b0, b1, b2),
    )
    spc = _where3(
        metal_rough,
        (
            0.04 * (1.0 - metal) + b0 * metal,
            0.04 * (1.0 - metal) + b1 * metal,
            0.04 * (1.0 - metal) + b2 * metal,
        ),
        (s0, s1, s2),
    )
    lrough = jnp.maximum(0.08, jnp.where(metal_rough, s1, 1.0 - s3))
    rough = lrough * lrough

    n = _normed(tr["n_raw"])
    v = _normed(_sub3(view_origin, tr["pos"]))
    ndv = _dot3(n, v)
    flip = (ndv <= 0.0) & (tr["double_sided"] > 0.5)
    n = _where3(flip, _neg3(n), n)
    return {
        "pos": tr["pos"],
        "n": n,
        "v": v,
        "dif": dif,
        "spec": spc,
        "lrough": lrough,
        "rough": rough,
        "emissive": tr["emissive"],
        "opacity": b3,
        "ior": tr["ior"],
    }


def _fetch_light(light_ref, idx, l_pad: int):
    """Select light row `idx` [S,128] from the SMEM table via scalar
    broadcast (tables are <= a few hundred rows)."""
    z = jnp.zeros_like(idx, jnp.float32)
    out = {
        "pos": (z, z, z), "dir": (z, z, z), "inten": (z, z, z),
        "type": z, "coso": z, "open": z, "pen": z,
    }
    for li in range(l_pad):
        sel = idx == li
        g = lambda f: jnp.where(sel, light_ref[li, f], 0.0)  # noqa: E731
        out["pos"] = _add3(out["pos"], (g(_L_POS), g(_L_POS + 1), g(_L_POS + 2)))
        out["dir"] = _add3(out["dir"], (g(_L_DIR), g(_L_DIR + 1), g(_L_DIR + 2)))
        out["inten"] = _add3(
            out["inten"], (g(_L_INT), g(_L_INT + 1), g(_L_INT + 2))
        )
        out["type"] = out["type"] + g(_L_TYPE)
        out["coso"] = out["coso"] + g(_L_COSO)
        out["open"] = out["open"] + g(_L_OPEN)
        out["pen"] = out["pen"] + g(_L_PEN)
    return out


def _eval_light_tiles(lrow, surf_pos):
    """scene.lights.eval_light on tiles -> (to_light3, intensity3, dist)."""
    lpos, ldir, linten = lrow["pos"], lrow["dir"], lrow["inten"]
    to_l = _sub3(lpos, surf_pos)
    dist_sq = _dot3(to_l, to_l)
    valid = dist_sq > 1e-5
    dist_pt = jnp.where(valid, jnp.sqrt(jnp.maximum(dist_sq, 1e-20)), 0.0)
    inv = 1.0 / jnp.maximum(dist_pt, 1e-20)
    l_pt = _where3(valid, _scale3(to_l, inv), (inv * 0.0,) * 3)
    falloff = 1.0 / (0.0001 + dist_sq)
    cos_theta = -_dot3(l_pt, ldir)
    falloff = jnp.where(cos_theta < lrow["coso"], 0.0, falloff)
    pen_scale = _saturate(
        ((lrow["open"] - _acos_approx(jnp.clip(cos_theta, -1.0, 1.0)))
         - lrow["pen"]) / jnp.maximum(lrow["pen"], 1e-9)
    )
    falloff = jnp.where(lrow["pen"] > 0.0, falloff * pen_scale, falloff)
    inten_pt = _scale3(linten, falloff)

    l_dir3 = _neg3(ldir)
    diff = _sub3(surf_pos, lpos)
    dist_dir = jnp.sqrt(jnp.maximum(_dot3(diff, diff), 0.0))
    pos_dir = _sub3(surf_pos, _scale3(ldir, dist_dir))

    is_dir = lrow["type"] == float(LIGHT_DIRECTIONAL)
    to_light = _where3(is_dir, l_dir3, l_pt)
    intensity = _where3(is_dir, linten, inten_pt)
    light_pos = _where3(is_dir, pos_dir, lpos)
    dvec = _sub3(light_pos, surf_pos)
    dist = jnp.sqrt(jnp.maximum(_dot3(dvec, dvec), 0.0))
    return to_light, intensity, dist


# ------------------------------------------------------------------ kernel
def _zeros_vertex(shape):
    # NOTE: is_spec is carried as f32 (0/1): Mosaic cannot truncate the i8
    # bools that jnp.where-selected bool state materializes back to i1
    # (same workaround as accel.pallas_subpath).
    z = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    return {
        "color": (z, z, z), "pos": (z, z, z), "n": (z, z, z), "v": (z, z, z),
        "dif": (z, z, z), "spec": (z, z, z), "rough": z, "is_spec": z,
        "pdf": z,
        # deferred-texture record fields (slot -1 => ratio 1; const 1 avoids
        # 0/0 in the post-kernel ratio); DCE'd when untextured
        "uv": (z, z), "bslot": -one, "bconst": (one, one, one),
    }


def _vertex_where(mask, a, b):
    out = {}
    for k in ("color", "pos", "n", "v", "dif", "spec", "uv", "bconst"):
        out[k] = _where3(mask, a[k], b[k])
    for k in ("rough", "pdf", "is_spec", "bslot"):
        out[k] = jnp.where(mask, a[k], b[k])
    return out


def frame_kernel(
    scal_ref,      # SMEM [1, NSCAL] f32
    iscal_ref,     # SMEM [1, 4] i32: bdpt_frame, light_count, pix offset, gbuf_frame
    light_ref,     # SMEM [L_pad, NLROW] f32
    ndc_ref,       # VMEM [2, S, 128] f32 base ndc (jitter-free)
    tri_ref,       # VMEM [T_pad, 48] f32
    out_ref,       # VMEM [R_OUT, S, 128] f32
    *,
    bounds, n_tris, l_pad, width, height, sub_pixels, d_max, mat_model,
    faithful_rng, reference_quirks, min_t, clamp_upper,
    enable_e1, enable_e2, enable_e3, emit_gbuffer, use_thin_lens,
    textured=False, connection_weight="uniform", splat_rgb8e=False,
):
    shape = (S, LANE)
    n_pix = width * height

    cam_pos = tuple(scal_ref[0, _C_POS + k] for k in range(3))
    cam_u = tuple(scal_ref[0, _C_U + k] for k in range(3))
    cam_v3 = tuple(scal_ref[0, _C_V + k] for k in range(3))
    cam_w = tuple(scal_ref[0, _C_W + k] for k in range(3))
    cam_n = tuple(scal_ref[0, _C_N + k] for k in range(3))
    inv_u2 = scal_ref[0, _C_IU2]
    inv_v2 = scal_ref[0, _C_IV2]
    inv_w2 = scal_ref[0, _C_IW2]
    jx = scal_ref[0, _C_JX]
    jy = scal_ref[0, _C_JY]
    env = tuple(scal_ref[0, _C_ENV + k] for k in range(3))
    lcnt_f = scal_ref[0, _C_LCNT]
    frame_u32 = iscal_ref[0, 0].astype(jnp.uint32)
    lcnt_i = iscal_ref[0, 1]

    pix0 = iscal_ref[0, 2]  # global pixel offset of this shard's rows
    cell = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lin = pix0 + cell * (S * LANE) + row * LANE + lane
    # padding lanes of a shard must not alias the next shard's pixels
    lane_ok = ((cell * (S * LANE) + row * LANE + lane) < sub_pixels) & (
        lin < n_pix
    )

    # ---------------- primary ray (G-buffer, lightProbeGBuffer.rt.hlsl) ----
    ndc_x = ndc_ref[0] + 2.0 * jx / float(width)
    ndc_y = ndc_ref[1] - 2.0 * jy / float(height)
    inv_wlen = jax.lax.rsqrt(_dot3(cam_w, cam_w))
    d_raw = (
        ndc_x * cam_u[0] + ndc_y * cam_v3[0] + cam_w[0],
        ndc_x * cam_u[1] + ndc_y * cam_v3[1] + cam_w[1],
        ndc_x * cam_u[2] + ndc_y * cam_v3[2] + cam_w[2],
    )
    d_raw = _scale3(d_raw, inv_wlen)
    cam_tiles = tuple(jnp.full(shape, c, jnp.float32) for c in cam_pos)
    zero_t = jnp.zeros(shape, jnp.float32)
    if use_thin_lens:
        # lightProbeGBuffer.rt.hlsl:119-145: lens origin from the G-buffer
        # pass's own RNG stream, direction through the focal point
        gbuf_u32 = iscal_ref[0, 3].astype(jnp.uint32)
        gseed = _tea16(
            pltpu.bitcast(lin, jnp.uint32), jnp.broadcast_to(gbuf_u32, shape)
        )
        gseed, u0 = _next_rand(gseed)
        gseed, u1 = _next_rand(gseed)
        lens_r = scal_ref[0, _C_LENSR]
        focal = scal_ref[0, _C_FOCAL]
        theta = 2.0 * M_PI * u0
        r = lens_r * u1
        lx = r * jnp.cos(theta)
        ly = r * jnp.sin(theta)
        u_n = tuple(scal_ref[0, _C_UN + k] for k in range(3))
        v_n = tuple(scal_ref[0, _C_VN + k] for k in range(3))
        origin0 = tuple(
            cam_tiles[k] + lx * u_n[k] + ly * v_n[k] for k in range(3)
        )
        focal_pt = _add3(cam_tiles, _scale3(d_raw, focal))
        prim_dir = _normed(_sub3(focal_pt, origin0))
    else:
        origin0 = cam_tiles
        prim_dir = _normed(d_raw)
    tr = _trace_rows(tri_ref, bounds, n_tris, origin0, prim_dir, zero_t, True)
    sd = _decode_shading(tr, cam_tiles)
    valid = tr["hit"] & lane_ok

    world_pos = _where3(valid, sd["pos"], (zero_t,) * 3)
    world_norm = _where3(valid, sd["n"], (zero_t,) * 3)
    dif = _where3(valid, sd["dif"], (env[0] + zero_t, env[1] + zero_t,
                                     env[2] + zero_t))
    spc = _where3(valid, sd["spec"], (zero_t,) * 3)
    lrough = jnp.where(valid, sd["lrough"], 0.0)
    rough = lrough * lrough
    emis = _where3(valid, sd["emissive"], (zero_t,) * 3)
    # camera-vertex view vector uses the pinhole position even under thin
    # lens (passes.bdpt: v = normalize(cam.pos_w - world_pos))
    v_tiles = _normed(_sub3(cam_tiles, world_pos))

    seed = _tea16(
        pltpu.bitcast(lin, jnp.uint32), jnp.broadcast_to(frame_u32, shape)
    )

    # ---------------- camera subpath ----------------
    zeros_vert = _zeros_vertex(shape)
    cam_path = [zeros_vert] * (d_max + 1)
    ones = jnp.ones(shape, jnp.float32)
    cam_path[0] = dict(
        zeros_vert,
        pos=tuple(c + zero_t for c in cam_pos),
        n=tuple(c + zero_t for c in cam_n),
        color=(ones, ones, ones),
        pdf=ones,
    )

    seed2, wgt, out_dir, pdf1, is_spec1, _ = _sample_brdf_tiles(
        seed, world_norm, v_tiles, dif, spc, rough, mat_model
    )
    if not faithful_rng:
        seed = seed2
    cam_path[1] = _vertex_where(
        valid,
        {
            "color": wgt, "pos": world_pos, "n": world_norm, "v": v_tiles,
            "dif": dif, "spec": spc, "rough": rough,
            "is_spec": is_spec1.astype(jnp.float32), "pdf": pdf1,
            "uv": tr["uv"], "bslot": tr["bc_tex"],
            "bconst": (tr["base"][0], tr["base"][1], tr["base"][2]),
        },
        zeros_vert,
    )

    def shoot(state):
        """passes.bdpt.shoot_ray on tiles; state mutated copy returned."""
        active = ~state["term"]
        tr_b = _trace_rows(
            tri_ref, bounds, n_tris, state["o"], state["d"],
            jnp.full(shape, min_t, jnp.float32), False,
        )
        sd_b = _decode_shading(tr_b, state["o"])
        seed_b, w_b, l_b, pdf_b, isspec_b, _ = _sample_brdf_tiles(
            state["seed"], sd_b["n"], sd_b["v"], sd_b["dif"], sd_b["spec"],
            sd_b["rough"], mat_model,
        )
        got = active & tr_b["hit"]
        missed = active & ~tr_b["hit"]
        new = dict(state)
        if faithful_rng:
            new["seed"] = state["seed"]
        else:
            new["seed"] = jnp.where(got, seed_b, state["seed"])
        new["color"] = _where3(
            got,
            tuple(c * w for c, w in zip(state["color"], w_b)),
            _where3(missed, (zero_t,) * 3, state["color"]),
        )
        new["pos"] = _where3(got, sd_b["pos"], state["pos"])
        new["n"] = _where3(got, sd_b["n"], state["n"])
        new["v"] = _where3(got, sd_b["v"], state["v"])
        new["dif"] = _where3(got, sd_b["dif"], state["dif"])
        new["spec"] = _where3(got, sd_b["spec"], state["spec"])
        new["rough"] = jnp.where(got, sd_b["rough"], state["rough"])
        new["is_spec"] = jnp.where(
            got, isspec_b.astype(jnp.float32), state["is_spec"]
        )
        new["pdf"] = jnp.where(got, pdf_b, state["pdf"])
        new["o"] = _where3(got, sd_b["pos"], state["o"])
        new["d"] = _where3(got, l_b, state["d"])
        new["uv"] = _where3(got, tr_b["uv"], state["uv"])
        new["bslot"] = jnp.where(got, tr_b["bc_tex"], state["bslot"])
        new["bconst"] = _where3(
            got, (tr_b["base"][0], tr_b["base"][1], tr_b["base"][2]),
            state["bconst"],
        )
        new["term"] = state["term"] | missed
        return new

    def vertex_of(state):
        return {
            "color": state["color"], "pos": state["pos"], "n": state["n"],
            "v": state["v"], "dif": state["dif"], "spec": state["spec"],
            "rough": state["rough"], "is_spec": state["is_spec"],
            "pdf": state["pdf"],
            "uv": state["uv"], "bslot": state["bslot"],
            "bconst": state["bconst"],
        }

    ones_t = jnp.ones(shape, jnp.float32)
    state = {
        "o": world_pos, "d": out_dir, "color": wgt, "seed": seed,
        "pos": world_pos, "n": (zero_t,) * 3, "v": (zero_t,) * 3,
        "dif": (zero_t,) * 3, "spec": (zero_t,) * 3, "rough": zero_t,
        "is_spec": zero_t, "pdf": zero_t, "term": ~valid,
        "uv": (zero_t, zero_t), "bslot": -ones_t,
        "bconst": (ones_t, ones_t, ones_t),
    }
    for depth in range(1, d_max):
        was_active = ~state["term"]
        state = shoot(state)
        cam_path[depth + 1] = _vertex_where(
            was_active, vertex_of(state), zeros_vert
        )
    seed = state["seed"]

    # ---------------- light subpath ----------------
    # sample_light (BDPTUtils.hlsli:140-152): pick, sphere, cos lobe
    seed, u_pick = _next_rand(seed)
    lidx = jnp.minimum((u_pick * lcnt_f).astype(jnp.int32), lcnt_i - 1)
    lrow0 = _fetch_light(light_ref, lidx, l_pad)
    is_dir = lrow0["type"] == float(LIGHT_DIRECTIONAL)
    seed_s, p_sph = _unit_sphere(seed)
    seed = jnp.where(is_dir, seed, seed_s)
    axis = _where3(is_dir, lrow0["dir"], p_sph)
    seed, l_dir0 = _cos_hemisphere(seed, axis)
    l_origin = lrow0["pos"]
    l_inten = lrow0["inten"]

    light_path = [zeros_vert] * (d_max + 1)
    light_path[0] = dict(
        zeros_vert, pos=l_origin, color=l_inten, pdf=ones / lcnt_f
    )
    take = [ones] * (d_max + 1)  # f32 flags (see _zeros_vertex note)
    lstate = {
        "o": l_origin, "d": l_dir0, "color": l_inten, "seed": seed,
        "pos": l_origin, "n": (zero_t,) * 3, "v": (zero_t,) * 3,
        "dif": (zero_t,) * 3, "spec": (zero_t,) * 3, "rough": zero_t,
        "is_spec": zero_t, "pdf": zero_t, "term": ~valid,
        "uv": (zero_t, zero_t), "bslot": -ones_t,
        "bconst": (ones_t, ones_t, ones_t),
    }
    for depth in range(0, d_max):
        was_active = ~lstate["term"]
        lstate = shoot(lstate)
        light_path[depth + 1] = _vertex_where(
            was_active, vertex_of(lstate), zeros_vert
        )
        take[depth + 1] = jnp.where(
            was_active, (~lstate["term"]).astype(jnp.float32), take[depth + 1]
        )
    seed = lstate["seed"]

    # ---------------- accumulate own-pixel ----------------
    out_r = jnp.zeros(shape, jnp.float32)
    out_g = jnp.zeros(shape, jnp.float32)
    out_b = jnp.zeros(shape, jnp.float32)
    out_a = jnp.zeros(shape, jnp.float32)

    has_emis = (emis[0] > 0.0) | (emis[1] > 0.0) | (emis[2] > 0.0)
    em_mask = valid & has_emis
    out_r = out_r + jnp.where(em_mask, emis[0], 0.0)
    out_g = out_g + jnp.where(em_mask, emis[1], 0.0)
    out_b = out_b + jnp.where(em_mask, emis[2], 0.0)

    min_t_tiles = jnp.full(shape, min_t, jnp.float32)

    # --- estimator 1: path tracing with NEE (BDPTMain:161-167) ---
    n_e1 = d_max if enable_e1 else 0
    e1 = []
    e1_rows = []  # textured: per-i (dif-linear, specular) raw parts
    for i in range(n_e1):
        seed, u = _next_rand(seed)
        idx = jnp.minimum((u * lcnt_f).astype(jnp.int32), lcnt_i - 1)
        lr = _fetch_light(light_ref, idx, l_pad)
        l3, inten3, dist = _eval_light_tiles(lr, cam_path[i + 1]["pos"])
        e1.append((l3, inten3, dist))
    for i in range(n_e1):
        l3, inten3, dist = e1[i]
        occ = _occluded_rows(
            tri_ref, bounds, n_tris, cam_path[i + 1]["pos"], l3,
            min_t_tiles, dist,
        )
        difp, specp = _nee_shade_tiles_split(
            ~occ, l3, inten3, cam_path[i + 1]["n"], cam_path[i + 1]["v"],
            cam_path[i + 1]["dif"], cam_path[i + 1]["spec"],
            cam_path[i + 1]["rough"], lcnt_f, mat_model,
        )
        if textured:
            # raw parts x camera throughput; the texture ratios, 1/(i+2)
            # scale, clamp and NaN guard are applied post-kernel in the
            # reference's order (BDPTMain:163-167)
            cc = cam_path[i]["color"]
            e1_rows += [c * dp for c, dp in zip(cc, difp)]
            e1_rows += [c * sp for c, sp in zip(cc, specp)]
            continue
        direct = tuple(dp + sp for dp, sp in zip(difp, specp))
        shade = tuple(c * dc for c, dc in zip(cam_path[i]["color"], direct))
        shade = _clamp3(_scale3(shade, 1.0 / (i + 2)), clamp_upper)
        shade = _nan_guard3(shade)
        out_r = out_r + jnp.where(valid, shade[0], 0.0)
        out_g = out_g + jnp.where(valid, shade[1], 0.0)
        out_b = out_b + jnp.where(valid, shade[2], 0.0)
        out_a = out_a + jnp.where(valid, 1.0, 0.0)

    # --- estimator 3: s,t connections (BDPTMain:212-233) ---
    e3_pairs = e3_pair_list(d_max, enable_e3)

    # corrected MIS (passes.bdpt._connection_weight: the intent of the
    # reference's dead getWeightPower/getWeightLinear, BDPTUtils.hlsli
    # :226-278, comma bug fixed): per-lane log-pdf chains of both subpaths,
    # shared across every (s,t) pair, then a max-subtracted softmax over
    # the splits of each total length.  Only the camera/light-path pdf and
    # geometry tiles feed it — no extra traces.
    if connection_weight != "uniform" and e3_pairs:
        mis_power = 2.0 if connection_weight == "power" else 1.0

        def _log_pdf_g(a, b):
            vec = _sub3(b["pos"], a["pos"])
            d2 = jnp.maximum(_dot3(vec, vec), 1e-30)
            dn = _scale3(vec, jax.lax.rsqrt(d2))

            def cosf(vtx):
                degenerate = _dot3(vtx["n"], vtx["n"]) < 0.5
                return jnp.where(degenerate, 1.0, jnp.abs(_dot3(vtx["n"], dn)))

            return (jnp.log(jnp.maximum(cosf(a) * cosf(b), 0.0))
                    - jnp.log(d2))

        def _cum_logpdf(path):
            lp = [jnp.log(jnp.maximum(path[0]["pdf"], 0.0))]
            for x in range(1, d_max + 1):
                lp.append(lp[-1]
                          + jnp.log(jnp.maximum(path[x]["pdf"], 0.0))
                          + _log_pdf_g(path[x - 1], path[x]))
            return lp

        lc = _cum_logpdf(cam_path)
        ll = _cum_logpdf(light_path)

        def _mis_weight(sx, tx, total_len):
            terms = [lc[i] + ll[total_len - i]
                     for i in range(0, total_len + 1)
                     if i <= d_max and (total_len - i) <= d_max]
            cur = lc[sx] + ll[tx]
            m = terms[0]
            for tterm in terms[1:]:
                m = jnp.maximum(m, tterm)
            denom = sum(jnp.exp(mis_power * (tt - m)) for tt in terms)
            w = jnp.exp(mis_power * (cur - m)) / jnp.maximum(denom, 1e-30)
            finite = (cur == cur) & (cur > -_BIG) & (cur < _BIG)
            return jnp.where(finite, w, 0.0)
    e3_rows = []  # textured: per-pair raw shade rgb + visibility mask
    for total_len, sx, tx in e3_pairs:
        vec = _sub3(light_path[tx]["pos"], cam_path[sx]["pos"])
        length_ab = jnp.sqrt(jnp.maximum(_dot3(vec, vec), 1e-30))
        dir_ab = _scale3(vec, 1.0 / length_ab)
        # interval shortened by min_t to exclude far-endpoint self-hits,
        # matching passes/bdpt.py est-3 (see comment there / PARITY.md)
        occ = _occluded_rows(
            tri_ref, bounds, n_tris, cam_path[sx]["pos"], dir_ab,
            min_t_tiles, length_ab - min_t_tiles,
        )
        vis = ~occ
        if tx >= 1:
            # evalGWithoutV (BDPTUtils.hlsli:172-184)
            inv_len = 1.0 / jnp.sqrt(jnp.maximum(_dot3(vec, vec), 1e-30))
            dd = _scale3(vec, inv_len)
            g = (
                jnp.abs(_dot3(cam_path[sx]["n"], dd))
                * jnp.abs(_dot3(light_path[tx]["n"], dd))
                * inv_len * inv_len
            )
            cam_end = cam_path[sx]
            light_end = light_path[tx]
            a_e = cam_path[sx - 1]["color"]
            a_l = (light_path[sx - 1]["color"] if reference_quirks
                   else light_path[tx - 1]["color"])
            connect_dir = _normed(_sub3(cam_end["pos"], light_end["pos"]))
            wo_l = _normed(_sub3(light_path[tx - 1]["pos"], light_end["pos"]))
            fs_l = _eval_brdf_tiles(
                connect_dir, wo_l, light_end["n"], light_end["dif"],
                light_end["spec"], light_end["rough"],
                light_end["is_spec"] > 0.5, mat_model,
            )
            wo_e = _normed(_sub3(cam_path[sx - 1]["pos"], cam_end["pos"]))
            fs_e = _eval_brdf_tiles(
                _neg3(connect_dir), wo_e, cam_end["n"], cam_end["dif"],
                cam_end["spec"], cam_end["rough"], cam_end["is_spec"] > 0.5,
                mat_model,
            )
            shade = tuple(
                al * (fl * g * fe) * ae
                for al, fl, fe, ae in zip(a_l, fs_l, fs_e, a_e)
            )
            if not textured:
                if connection_weight != "uniform":
                    w = _mis_weight(sx, tx, total_len)
                    shade = tuple(c * w for c in shade)
                else:
                    shade = _scale3(shade, 1.0 / float(total_len))
                shade = _clamp3(shade, clamp_upper)
                shade = _nan_guard3(shade)
        else:
            shade = (zero_t, zero_t, zero_t)
        mask = valid & vis
        if textured:
            # raw monomial parts; ratio products, 1/totalLength, clamp,
            # NaN guard and the saturate chain replay post-kernel
            e3_rows += [shade[0], shade[1], shade[2],
                        mask.astype(jnp.float32)]
            continue
        out_r = jnp.where(mask, _saturate(out_r + shade[0]), out_r)
        out_g = jnp.where(mask, _saturate(out_g + shade[1]), out_g)
        out_b = jnp.where(mask, _saturate(out_b + shade[2]), out_b)
        out_a = jnp.where(mask, _saturate(out_a + 1.0), out_a)

    # --- estimator 2: light-tracing splats (BDPTMain:171-208) ---
    n_e2 = d_max if enable_e2 else 0
    splat_rows = []
    take_cum = jnp.ones(shape, bool)
    for i in range(n_e2):
        take_cum = take_cum & (take[i + 1] > 0.5)
        last = light_path[i + 1]
        to_cam = _sub3(tuple(c + zero_t for c in cam_pos), last["pos"])
        dis = jnp.sqrt(jnp.maximum(_dot3(to_cam, to_cam), 1e-30))
        dir_to_cam = _scale3(to_cam, 1.0 / dis)
        occ = _occluded_rows(
            tri_ref, bounds, n_tris, last["pos"], dir_to_cam,
            min_t_tiles, dis,
        )
        facing = _dot3(cam_n, dir_to_cam) < 0.0
        active2 = valid & take_cum & facing & ~occ
        # project_dir_to_pixel (BDPTUtils.hlsli:129-138)
        d1 = _dot3(dir_to_cam, cam_u) * inv_u2
        d2 = _dot3(dir_to_cam, cam_v3) * inv_v2
        d3 = _dot3(dir_to_cam, cam_w) * inv_w2
        ndcx = d1 / d3
        ndcy = -d2 / d3
        px = (ndcx * 0.5 + 0.5) * float(width) - jx
        py = (ndcy * 0.5 + 0.5) * float(height) - jy
        ix = jnp.round(px).astype(jnp.int32)
        iy = jnp.round(py).astype(jnp.int32)
        theta1 = _saturate(jnp.abs(_dot3(dir_to_cam, cam_n)))
        theta2 = _saturate(jnp.abs(_dot3(dir_to_cam, last["n"])))
        g = theta1 * theta2 / (dis * dis)
        brdf = _eval_brdf_tiles(
            last["v"], dir_to_cam, last["n"], last["dif"], last["spec"],
            last["rough"], last["is_spec"] > 0.5, mat_model,
        )
        shade = tuple(
            lc * bc * g for lc, bc in zip(light_path[i]["color"], brdf)
        )
        if not textured:
            shade = _clamp3(_scale3(shade, 1.0 / (i + 2)), clamp_upper)
            shade = _nan_guard3(shade)
        in_range = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
        ok = active2 & in_range
        pix = jnp.where(ok, iy * width + ix, n_pix).astype(jnp.float32)
        splat_rows.append(pix)
        if splat_rgb8e:
            # pack the update payload IN-KERNEL (2 rows/depth instead of
            # 5): the downstream rgb8e splat consumes [pix, packed]
            # directly (ops.splat.scatter_add_rgba_prepacked) — no XLA
            # -side pack passes, 9 fewer kernel output rows at d=3.
            # Bit-identical to packing host-side (same _pack_rgb8e math).
            packed = _pack_rgb8e_tiles(
                jnp.where(ok, shade[0], 0.0),
                jnp.where(ok, shade[1], 0.0),
                jnp.where(ok, shade[2], 0.0),
            )
            splat_rows.append(pltpu.bitcast(packed, jnp.float32))
        else:
            splat_rows.append(jnp.where(ok, shade[0], 0.0))
            splat_rows.append(jnp.where(ok, shade[1], 0.0))
            splat_rows.append(jnp.where(ok, shade[2], 0.0))
            splat_rows.append(ok.astype(jnp.float32))

    # background early-out wrote (env, 1) (BDPTMain:62-66)
    if textured:
        # own-pixel accumulation (emissive + est1 + est3 saturate chain +
        # background fold) replays post-kernel where textures are available
        res_r = res_g = res_b = res_a = zero_t
    else:
        res_r = jnp.where(valid, out_r, dif[0])
        res_g = jnp.where(valid, out_g, dif[1])
        res_b = jnp.where(valid, out_b, dif[2])
        res_a = jnp.where(valid, out_a, 1.0)

    rows = [res_r, res_g, res_b, res_a] + splat_rows
    if emit_gbuffer:
        validf = valid.astype(jnp.float32)
        dvec = _sub3(world_pos, tuple(c + zero_t for c in cam_pos))
        dist_cam = jnp.sqrt(jnp.maximum(_dot3(dvec, dvec), 0.0))
        rows += [
            world_pos[0], world_pos[1], world_pos[2], validf,
            world_norm[0], world_norm[1], world_norm[2],
            jnp.where(valid, dist_cam, 0.0),
            dif[0], dif[1], dif[2], jnp.where(valid, sd["opacity"], 1.0),
            spc[0], spc[1], spc[2], lrough,
            jnp.where(valid, sd["ior"], 0.0),
            emis[0], emis[1], emis[2],
        ]
    if textured:
        neg1 = jnp.full(shape, -1.0, jnp.float32)
        for k in range(1, d_max + 1):
            vtx = cam_path[k]
            rows += [
                vtx["uv"][0], vtx["uv"][1], vtx["bslot"], vtx["is_spec"],
                vtx["bconst"][0], vtx["bconst"][1], vtx["bconst"][2],
            ]
        for k in range(1, d_max + 1):
            vtx = light_path[k]
            rows += [
                vtx["uv"][0], vtx["uv"][1], vtx["bslot"], vtx["is_spec"],
                vtx["bconst"][0], vtx["bconst"][1], vtx["bconst"][2],
            ]
        rows.append(jnp.where(valid, tr["em_tex"], neg1))
        rows += e1_rows
        rows += e3_rows
    for k, r in enumerate(rows):
        out_ref[k] = r


# ---------------------------------------------------------------- wrapper
N_GBUF_ROWS = 20


def e3_pair_list(d_max: int, enable_e3: bool):
    """The (totalLength, s, t) connection pairs in BDPTMain.rt.hlsl:212-233
    loop order (shared by the kernel and the deferred-texture replay)."""
    pairs = []
    for total_len in range(2, (d_max + 1) if enable_e3 else 0):
        for sx in range(1, d_max):
            tx = total_len - sx
            if tx < 0 or tx > d_max:  # max_possible guard handled by d_max
                continue
            pairs.append((total_len, sx, tx))
    return tuple(pairs)


def out_rows(d_max: int, enable_e2: bool, emit_gbuffer: bool,
             textured: bool = False, enable_e1: bool = True,
             enable_e3: bool = True, splat_rgb8e: bool = False) -> int:
    per_depth = 2 if splat_rgb8e else 5
    r = 4 + (per_depth * d_max if enable_e2 else 0) + (
        N_GBUF_ROWS if emit_gbuffer else 0
    )
    if textured:
        r += 14 * d_max + 1                      # vertex records + em slot
        r += 6 * (d_max if enable_e1 else 0)     # est1 (dif, spec) parts
        r += 4 * len(e3_pair_list(d_max, enable_e3))   # est3 shade + mask
    return r


@functools.partial(jax.jit, static_argnames=(
    "bounds", "n_tris", "l_pad", "width", "height", "sub_pixels", "d_max",
    "mat_model", "faithful_rng", "reference_quirks", "min_t", "clamp_upper",
    "enable_e1", "enable_e2", "enable_e3", "emit_gbuffer", "use_thin_lens",
    "textured", "connection_weight", "splat_rgb8e", "interpret",
))
def _launch_frame(
    scal, iscal, light_rows, ndc, tri_pack,
    bounds, n_tris, l_pad, width, height, sub_pixels, d_max, mat_model,
    faithful_rng, reference_quirks, min_t, clamp_upper,
    enable_e1, enable_e2, enable_e3, emit_gbuffer, use_thin_lens, textured,
    connection_weight, splat_rgb8e, interpret,
):
    n_pad = ((sub_pixels + S * LANE - 1) // (S * LANE)) * (S * LANE)
    n_cols = n_pad // LANE
    r_out = out_rows(d_max, enable_e2, emit_gbuffer, textured, enable_e1,
                     enable_e3, splat_rgb8e)
    kernel = functools.partial(
        frame_kernel,
        bounds=bounds, n_tris=n_tris, l_pad=l_pad, width=width, height=height,
        sub_pixels=sub_pixels,
        d_max=d_max, mat_model=mat_model, faithful_rng=faithful_rng,
        reference_quirks=reference_quirks, min_t=min_t,
        clamp_upper=clamp_upper, enable_e1=enable_e1, enable_e2=enable_e2,
        enable_e3=enable_e3, emit_gbuffer=emit_gbuffer,
        use_thin_lens=use_thin_lens, textured=textured,
        connection_weight=connection_weight, splat_rgb8e=splat_rgb8e,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_cols // S,),
        in_specs=[
            pl.BlockSpec((1, NSCAL), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(light_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2, S, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_pack.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_out, S, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_out, n_cols, LANE), jnp.float32),
        # the textured variant keeps ~77 extra [8,128] rows (vertex records
        # + raw estimator parts) live to the final writes; Mosaic's DEFAULT
        # scoped-vmem stack limit is 16 MB (v5e physical VMEM is far
        # larger), and the textured kernel needs ~19 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, iscal, light_rows, ndc, tri_pack)


@functools.lru_cache(maxsize=8)
def _base_ndc_rows_np(width: int, height: int):
    n_pix = width * height
    n_pad = ((n_pix + S * LANE - 1) // (S * LANE)) * (S * LANE)
    lin = np.arange(n_pad)
    x = (lin % width).astype(np.float32)
    y = (lin // width).astype(np.float32)
    ndc_x = 2.0 * x / width - 1.0
    ndc_y = -2.0 * y / height + 1.0
    return np.stack([ndc_x, ndc_y]).reshape(2, n_pad // LANE, LANE)


def supports_megakernel(baked, cfg, max_tris: int = 2048) -> bool:
    """Static gate: TPU path scope (see module docstring).

    Textured scenes qualify through DEFERRED texturing when only the
    base-color (and emissive) kinds are textured (BakedScene.tex_defer_ok,
    scene.Scene.bake): the kernel shades with per-material mean albedos and
    the texel/mean ratios multiply into each estimator term post-kernel —
    exact for every dif-linear factor because evalBRDF dispatches on the
    sampled lobe (MaterialUtils.hlsli:102-110).  Known estimator deviation:
    probabilityToSampleDiffuse (MaterialUtils.hlsli:22-27) sees the mean
    rather than the texel albedo (same expectation; see BDPTConfig
    .defer_textures)."""
    data = baked.data
    untextured = tuple(data.textures.data.shape[:2]) == (1, 1)  # dummy atlas
    tex_ok = untextured or (
        cfg.bdpt.defer_textures
        and getattr(baked, "tex_defer_ok", False)
        # the deferred row budget grows ~O(d^2); stay in the measured range
        and cfg.bdpt.max_depth <= 4
    )
    return (
        int(baked.tris.v0.shape[0]) <= max_tris
        and tuple(data.env_map.shape[:2]) == (1, 1)
        and tex_ok
        and not getattr(baked, "has_alpha", False)
        # corrected MIS runs in-kernel for untextured scenes (round 5);
        # the textured replay's post-kernel clamp bakes 1/totalLength, so
        # deferred-texture scenes still require uniform weighting
        and (cfg.bdpt.connection_weight == "uniform" or untextured)
        and cfg.bdpt.max_depth >= 1
    )


def _textured_replay(out, n_sub, bcfg, atlas):
    """Post-kernel deferred-texture replay (see frame_kernel textured rows).

    Applies per-vertex texel/mean base-color ratios to the kernel's raw
    estimator parts and replays the own-pixel accumulation exactly in the
    reference's order (emissive add -> est1 adds -> est3 saturate chain ->
    background fold, BDPTMain.rt.hlsl:155-233).  Returns (res4 [n_sub, 4],
    splats [(lin, rgb, alpha)] per light-tracing depth, dif_ratio1
    [n_sub, 3], em3 [n_sub, 3]) — the last two fix the G-buffer channels'
    MaterialDiffuse/Emissive to their texture-sampled values.

    Layout: ALL interior math is FIELD-MAJOR ([3, N] / [N] lane vectors) —
    the row-major [N, 3] form pads 3 channels to 128 lanes per elementwise
    op and cost 230 ms/frame standalone on the 342-tri room at 720p
    (benchmarks/replay_micro.py); transposes happen once at the return
    boundary only.
    """
    from ..ops.texture import sample_or_constant_fm

    d_max = bcfg.max_depth
    n_e1 = d_max if bcfg.enable_path_tracing else 0
    n_e2 = d_max if bcfg.enable_light_tracing else 0
    pairs = e3_pair_list(d_max, bcfg.enable_connections)
    flat = out.reshape(out.shape[0], -1)[:, :n_sub]

    def row(k):
        return flat[k]

    def row3(k):
        return flat[k:k + 3]  # [3, N] field-major

    gb = 4 + 5 * n_e2
    xt = gb + N_GBUF_ROWS
    valid = row(gb + 3) > 0.0
    dif_env = row3(gb + 8)
    emis_const = row3(gb + 17)

    def vertex(base):
        u = row(base)
        v = row(base + 1)
        slot = row(base + 2).astype(jnp.int32)
        lobe = row(base + 3)
        bconst = row3(base + 4)
        tap = sample_or_constant_fm(
            atlas, slot, u, v, jnp.ones((4, n_sub), jnp.float32),
            static_used=atlas.any_base,
        )
        # [N] masks broadcast against [3, N] without reshapes
        ratio = jnp.where(
            slot >= 0, tap[:3] / jnp.maximum(bconst, 1e-6), 1.0
        )
        rhat = jnp.where(lobe > 0.5, 1.0, ratio)
        return (u, v), slot, ratio, rhat

    cam = [vertex(xt + 7 * (k - 1)) for k in range(1, d_max + 1)]
    lig = [vertex(xt + 7 * d_max + 7 * (k - 1)) for k in range(1, d_max + 1)]
    one = jnp.float32(1.0)
    r_c = [one]
    for _, _, _, rhat in cam:
        r_c.append(r_c[-1] * rhat)
    r_l = [one]
    for _, _, _, rhat in lig:
        r_l.append(r_l[-1] * rhat)

    em_slot = row(xt + 14 * d_max).astype(jnp.int32)
    u1, v1 = cam[0][0]
    em3 = sample_or_constant_fm(
        atlas, em_slot, u1, v1,
        jnp.concatenate([emis_const, jnp.ones((1, n_sub), jnp.float32)], 0),
        static_used=atlas.any_emissive,
    )[:3]

    def guard(c):
        bad = jnp.isnan(c).any(axis=0, keepdims=True)
        return jnp.where(bad, 0.0, c)

    out_rgb = jnp.zeros((3, n_sub), jnp.float32)
    out_a = jnp.zeros((n_sub,), jnp.float32)
    has_em = (em3 > 0.0).any(axis=0)
    out_rgb = out_rgb + jnp.where(valid & has_em, em3, 0.0)

    e1_base = xt + 14 * d_max + 1
    for i in range(n_e1):
        difp = row3(e1_base + 6 * i)
        specp = row3(e1_base + 6 * i + 3)
        full = r_c[i] * (difp * cam[i][2] + specp)
        full = guard(jnp.clip(full / (i + 2), 0.0, bcfg.clamp_upper))
        out_rgb = out_rgb + jnp.where(valid, full, 0.0)
        out_a = out_a + jnp.where(valid, 1.0, 0.0)

    e3_base = e1_base + 6 * n_e1
    for p, (total_len, sx, tx) in enumerate(pairs):
        shade = row3(e3_base + 4 * p)
        mask = row(e3_base + 4 * p + 3) > 0.5
        if tx >= 1:
            a_l_ratio = r_l[sx - 1] if bcfg.reference_quirks else r_l[tx - 1]
            full = shade * r_c[sx - 1] * cam[sx - 1][3] * lig[tx - 1][3] \
                * a_l_ratio
            full = guard(
                jnp.clip(full / float(total_len), 0.0, bcfg.clamp_upper)
            )
        else:
            full = jnp.zeros((3, n_sub), jnp.float32)
        out_rgb = jnp.where(
            mask, jnp.clip(out_rgb + full, 0.0, 1.0), out_rgb
        )
        out_a = jnp.where(mask, jnp.clip(out_a + 1.0, 0.0, 1.0), out_a)

    res_rgb = jnp.where(valid, out_rgb, dif_env)
    res_a = jnp.where(valid, out_a, 1.0)
    res4 = jnp.concatenate([res_rgb, res_a[None]], 0).T

    splats = []
    for i in range(n_e2):
        base = 4 + 5 * i
        lin = row(base).astype(jnp.int32)
        raw = row3(base + 1)
        ok = row(base + 4) > 0.5
        full = raw * r_l[i] * lig[i][3]
        full = guard(jnp.clip(full / (i + 2), 0.0, bcfg.clamp_upper))
        splats.append((lin, jnp.where(ok, full, 0.0).T, row(base + 4)))

    return res4, splats, cam[0][2].T, em3.T


def _frame_out(
    baked, width: int, height: int, bdpt_frame, pixel_jitter, cfg,
    tri_pack=None, interpret: bool | None = None,
    sub_height: int | None = None, pixel_offset=None, ndc_rows=None,
    gbuf_frame=0,
):
    """Kernel-output stage of render_frame_megakernel: all host-side arg
    packing plus the one pallas_call.  Split out so benchmarks can time the
    raw field-row output and the deferred-texture replay separately
    (benchmarks/replay_micro.py).  Returns
    (out [rows, ...], n_sub, n_pix, sub_h, textured, pix0, splat_packed);
    splat_packed=True means est-2 splat rows are the 2-row/depth
    [pix_f32, rgb8e_i32_bitcast] layout (packed IN-kernel; consumed by
    ops.splat.scatter_add_rgba_prepacked)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data = baked.data
    textured = tuple(data.textures.data.shape[:2]) != (1, 1)
    cam = data.camera
    lights = data.lights
    bcfg = cfg.bdpt
    d_max = bcfg.max_depth
    sub_h = height if sub_height is None else sub_height
    n_sub = sub_h * width
    n_pix = width * height

    if tri_pack is None:
        tri_pack = pack_shaded_tris_lane(baked.tris, data.materials)
    bounds = chunk_bounds(tri_pack.shape[0])

    gcfg = cfg.gbuffer
    use_thin_lens = bool(gcfg.use_thin_lens)
    lens_radius = (
        gcfg.focal_length_gui / (2.0 * gcfg.f_stop) if use_thin_lens else 0.0
    )
    scal = jnp.concatenate([
        cam.pos_w, cam.camera_u, cam.camera_v, cam.camera_w,
        cam.camera_w / jnp.linalg.norm(cam.camera_w),
        jnp.stack([
            1.0 / jnp.vdot(cam.camera_u, cam.camera_u),
            1.0 / jnp.vdot(cam.camera_v, cam.camera_v),
            1.0 / jnp.vdot(cam.camera_w, cam.camera_w),
            pixel_jitter[0], pixel_jitter[1],
        ]),
        data.env_map[0, 0, :3],
        lights.count.astype(jnp.float32)[None],
        jnp.asarray([lens_radius, gcfg.focal_length_gui], jnp.float32),
        cam.camera_u / jnp.linalg.norm(cam.camera_u),
        cam.camera_v / jnp.linalg.norm(cam.camera_v),
    ]).astype(jnp.float32)[None, :]
    pix0 = (
        jnp.asarray(0, jnp.int32) if pixel_offset is None
        else jnp.asarray(pixel_offset).astype(jnp.int32)
    )
    iscal = jnp.stack([
        jnp.asarray(bdpt_frame).astype(jnp.int32), lights.count, pix0,
        jnp.asarray(gbuf_frame).astype(jnp.int32),
    ])[None, :]
    light_rows = jnp.concatenate([
        lights.pos_w, lights.dir_w, lights.intensity,
        lights.type.astype(jnp.float32)[:, None],
        lights.cos_opening_angle[:, None],
        lights.opening_angle[:, None],
        lights.penumbra_angle[:, None],
    ], axis=-1).astype(jnp.float32)
    l_pad = int(light_rows.shape[0])

    ndc = (
        jnp.asarray(_base_ndc_rows_np(width, height))
        if ndc_rows is None
        else ndc_rows
    )

    # kernel-side rgb8e packing whenever the downstream splat would pack
    # anyway (splat_mode auto resolves to tiled_rgb8e on TPU; an explicit
    # tiled_rgb8e engages it under interpret for the CPU parity tests)
    splat_packed = (not textured) and bcfg.enable_light_tracing and (
        bcfg.splat_mode == "tiled_rgb8e"
        or (bcfg.splat_mode == "auto" and jax.default_backend() == "tpu")
    )
    out = _launch_frame(
        scal, iscal, light_rows, ndc, tri_pack,
        bounds, int(baked.tris.v0.shape[0]), l_pad, width, height, n_sub,
        d_max,
        bcfg.mat_model, bcfg.faithful_rng, bcfg.reference_quirks,
        float(bcfg.min_t), float(bcfg.clamp_upper),
        bcfg.enable_path_tracing, bcfg.enable_light_tracing,
        bcfg.enable_connections, True, use_thin_lens, textured,
        bcfg.connection_weight, splat_packed, interpret,
    )
    return out, n_sub, n_pix, sub_h, textured, pix0, splat_packed


def render_frame_megakernel(
    baked, width: int, height: int, bdpt_frame, pixel_jitter, cfg,
    tri_pack=None, interpret: bool | None = None,
    sub_height: int | None = None, pixel_offset=None, ndc_rows=None,
    axis_name: str | None = None, gbuf_frame=0,
):
    """Run the megakernel; returns (channels dict, frame_img [H,W,4]).

    Replicates gbuffer.ray_traced_gbuffer + passes.bdpt.bdpt_pass for the
    supported scope; the estimator-2 splats are scatter-added host-side in
    the same order as passes.bdpt.

    Sharded use (inside shard_map over a row mesh): pass `sub_height` (rows
    this shard renders), `pixel_offset` (global linear index of this
    shard's first pixel — feeds the per-pixel RNG so shards reproduce the
    single-chip sequences), `ndc_rows` (this shard's slice of the base NDC
    rows), and `axis_name`.  Light-tracing splats land on *global* pixel
    ids; with `axis_name` the splat image is psum-reduced over the mesh
    (the one cross-chip collective — SURVEY.md §2.5) and this shard's rows
    are sliced back out.
    """
    from ..ops import splat as splat_mod

    data = baked.data
    bcfg = cfg.bdpt
    d_max = bcfg.max_depth
    if axis_name is None and (sub_height is not None
                              and sub_height != height):
        raise ValueError("sub_height without axis_name is unsupported")
    out, n_sub, n_pix, sub_h, textured, pix0, splat_packed = _frame_out(
        baked, width, height, bdpt_frame, pixel_jitter, cfg,
        tri_pack=tri_pack, interpret=interpret, sub_height=sub_height,
        pixel_offset=pixel_offset, ndc_rows=ndc_rows, gbuf_frame=gbuf_frame,
    )

    def img(row0, n=4):
        flat = out[row0:row0 + n].reshape(n, -1)[:, :n_sub]
        return flat.T.reshape(sub_h, width, n)

    tex_splats = dif_ratio1 = em3 = None
    if textured:
        res4, tex_splats, dif_ratio1, em3 = _textured_replay(
            out, n_sub, bcfg, data.textures
        )
        result = res4.reshape(sub_h, width, 4)
    else:
        result = img(0)

    # splats: host-side scatter in the reference's depth order
    if bcfg.enable_light_tracing:
        if textured:
            lin = jnp.concatenate(
                [s[0].reshape(-1) for s in tex_splats]
            )
            rgb = jnp.concatenate([s[1] for s in tex_splats], 0)
            a = jnp.concatenate([s[2] for s in tex_splats])
        elif splat_packed:
            # 2-row/depth layout: [pix_f32, rgb8e_i32_bitcast] straight
            # into the prepacked rgb8e splat (no XLA-side pack passes)
            lin_all, pay_all = [], []
            for i in range(d_max):
                base = 4 + 2 * i
                rows = out[base:base + 2].reshape(2, -1)[:, :n_sub]
                lin_all.append(rows[0].astype(jnp.int32))
                pay_all.append(
                    jax.lax.bitcast_convert_type(rows[1], jnp.int32))
            splat_flat = splat_mod.scatter_add_rgba_prepacked(
                jnp.concatenate(lin_all), jnp.concatenate(pay_all), n_pix,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            lin_all, r_all, g_all, b_all, a_all = [], [], [], [], []
            for i in range(d_max):
                base = 4 + 5 * i
                rows = out[base:base + 5].reshape(5, -1)[:, :n_sub]
                lin_all.append(rows[0].astype(jnp.int32).reshape(-1))
                r_all.append(rows[1])
                g_all.append(rows[2])
                b_all.append(rows[3])
                a_all.append(rows[4])
            lin = jnp.concatenate(lin_all)
            rgb = jnp.stack([
                jnp.concatenate(r_all), jnp.concatenate(g_all),
                jnp.concatenate(b_all),
            ], -1)
            a = jnp.concatenate(a_all)
        if not splat_packed or textured:
            splat_flat = splat_mod.scatter_add_rgba(
                bcfg.splat_mode, lin, rgb, a, n_pix, alpha_is_count=True,
                segments=(len(tex_splats) if textured else d_max)
                if bcfg.splat_segments else 1,
            )
        if axis_name is not None:
            # the one cross-chip collective: reduce splat images over ICI,
            # then keep this shard's rows
            splat_flat = jax.lax.psum(splat_flat, axis_name)
            splat = jax.lax.dynamic_slice(
                splat_flat.reshape(height, width, 4),
                (pix0 // width, 0, 0), (sub_h, width, 4),
            )
        else:
            splat = splat_flat.reshape(sub_h, width, 4)
        got_splat = jnp.any(splat != 0.0, axis=-1, keepdims=True)
        frame_img = jnp.where(
            got_splat, jnp.clip(result + splat, 0.0, 1.0), result
        )
    else:
        frame_img = result

    gb = 4 + ((2 if splat_packed else 5) * d_max
              if bcfg.enable_light_tracing else 0)
    gbuf = img(gb, N_GBUF_ROWS)
    mat_dif = gbuf[..., 8:12]
    emis3 = gbuf[..., 17:20]
    if textured:
        # the kernel shaded with mean albedos; restore the texel values the
        # G-buffer channels carry (lightProbeGBuffer.rt.hlsl:110-116)
        mat_dif = jnp.concatenate([
            gbuf[..., 8:11] * dif_ratio1.reshape(sub_h, width, 3),
            gbuf[..., 11:12],
        ], -1)
        emis3 = em3.reshape(sub_h, width, 3)
    channels = {
        "WorldPosition": gbuf[..., 0:4],
        "WorldNormal": gbuf[..., 4:8],
        "MaterialDiffuse": mat_dif,
        "MaterialSpecRough": gbuf[..., 12:16],
        "MaterialExtraParams": jnp.concatenate(
            [gbuf[..., 16:17], jnp.zeros((sub_h, width, 3), jnp.float32)], -1
        ),
        "Emissive": jnp.concatenate(
            [emis3, jnp.zeros((sub_h, width, 1), jnp.float32)], -1
        ),
        "BDPT": frame_img,
    }
    return channels, frame_img
