"""Independent brute-force numpy path tracer — the fidelity oracle.

Written from the reference's equations ONLY (BDPTMain.rt.hlsl estimator 1,
MaterialUtils.hlsli lambertianDirect, Lights.slang point falloff); shares NO
code with fyp_bidirectionalpathtracer_tpu.  Scene: the analytic Cornell box
(5 axis-aligned wall quads + 2 axis-aligned boxes + 1 point light) matching
models.procedural.cornell_box geometrically.

Scope: Lambertian materials, the path-tracing estimator family at depth<=2:
  out = emissive + direct(v1)/2 + albedo(v1) * direct(v2)/3
with each term channel-clamped to [0, clamp_upper] per sample — exactly the
pipeline's estimator-1 weights (BDPTMain.rt.hlsl:161-167).  Depth-1 is
deterministic (point light, center jitter); depth-2's bounce is cosine
sampled with numpy's own RNG, so comparisons are statistical.
"""
from __future__ import annotations

import numpy as np

# ---- scene constants (mirror models.procedural.cornell_box) ----
WHITE = np.array([0.73, 0.73, 0.73], np.float32)
RED = np.array([0.63, 0.065, 0.05], np.float32)
GREEN = np.array([0.14, 0.45, 0.091], np.float32)
LIGHT_POS = np.array([0.5, 0.93, 0.5], np.float32)
LIGHT_INTENSITY = np.array([18.0, 18.0, 18.0], np.float32)
CLAMP_UPPER = 0.9
MIN_T = 1.0e-3

# walls: (axis, plane value, interior-normal sign, albedo)
_WALLS = [
    (1, 0.0, +1.0, WHITE),   # floor
    (1, 1.0, -1.0, WHITE),   # ceiling
    (2, 1.0, -1.0, WHITE),   # back
    (0, 0.0, +1.0, RED),     # left
    (0, 1.0, -1.0, GREEN),   # right
]
# boxes: (lo, hi) AABBs, white
_BOXES = [
    (np.array([0.20, 0.00, 0.50]), np.array([0.50, 0.60, 0.80])),
    (np.array([0.53, 0.00, 0.20]), np.array([0.83, 0.30, 0.50])),
]


def intersect(o, d, tmax=None):
    """Closest hit for rays o + t*d (both [N,3]).  Returns (t [N], n [N,3],
    albedo [N,3], hit [N])."""
    n_rays = o.shape[0]
    best_t = np.full(n_rays, np.inf, np.float64)
    best_n = np.zeros((n_rays, 3), np.float64)
    best_alb = np.zeros((n_rays, 3), np.float64)

    def consider(t, n, alb, valid):
        better = valid & (t > MIN_T) & (t < best_t)
        best_t[better] = t[better]
        best_n[better] = n[better] if n.ndim == 2 else n
        if alb.ndim == 2:
            best_alb[better] = alb[better]
        else:
            best_alb[better] = alb

    for axis, value, sign, alb in _WALLS:
        dz = d[:, axis]
        t = np.where(np.abs(dz) > 1e-12, (value - o[:, axis]) / np.where(
            np.abs(dz) > 1e-12, dz, 1.0), np.inf)
        p = o + t[:, None] * d
        oth = [a for a in range(3) if a != axis]
        inside = (
            (p[:, oth[0]] >= 0.0) & (p[:, oth[0]] <= 1.0)
            & (p[:, oth[1]] >= 0.0) & (p[:, oth[1]] <= 1.0)
        )
        n = np.zeros(3)
        n[axis] = sign
        consider(t, n, alb, np.isfinite(t) & inside)

    for lo, hi in _BOXES:
        inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
        t0 = (lo[None, :] - o) * inv
        t1 = (hi[None, :] - o) * inv
        tn = np.minimum(t0, t1)
        tf = np.maximum(t0, t1)
        t_near = tn.max(axis=1)
        t_far = tf.min(axis=1)
        hit_face = tn.argmax(axis=1)
        valid = (t_near <= t_far) & (t_far > MIN_T) & (t_near > MIN_T)
        n = np.zeros((n_rays, 3))
        rows = np.arange(n_rays)
        n[rows, hit_face] = -np.sign(d[rows, hit_face])
        consider(t_near, n, WHITE, valid)
        # rays starting ON/inside the solid box (est-3 connections leave a
        # box surface inward — the reference's abs-cosine evalGWithoutV
        # keeps such paths): the mesh's far face is a real occluder, so
        # the slab hit is the EXIT at t_far with the exit face's normal
        exit_face = tf.argmin(axis=1)
        valid_in = (t_near <= t_far) & (t_near <= MIN_T) & (t_far > MIN_T)
        n_in = np.zeros((n_rays, 3))
        n_in[rows, exit_face] = np.sign(d[rows, exit_face])
        consider(t_far, n_in, WHITE, valid_in)

    hit = np.isfinite(best_t)
    if tmax is not None:
        hit = hit & (best_t < tmax)
    return best_t, best_n, best_alb, hit


def _advance(o, t, d):
    return o + np.where(np.isfinite(t), t, 0.0)[:, None] * d


def shadow_visible(p, dist, l):
    t, _, _, hit = intersect(p, l, tmax=dist - 1e-4)
    return ~hit


def direct_light(p, n, albedo):
    """lambertianDirect with 1 point light: N_lights * max(n.l, 0) *
    intensity * falloff * albedo / pi; falloff = 1/(0.0001 + d^2)."""
    to_l = LIGHT_POS[None, :] - p
    dist_sq = (to_l * to_l).sum(axis=1)
    dist = np.sqrt(dist_sq)
    l = to_l / dist[:, None]
    falloff = 1.0 / (0.0001 + dist_sq)
    cos = np.maximum((n * l).sum(axis=1), 0.0)
    vis = shadow_visible(p, dist, l)
    return (vis * cos * falloff)[:, None] * LIGHT_INTENSITY[None, :] * albedo / np.pi


def camera_rays(width, height, cam_pos, cam_u, cam_v, cam_w):
    """Falcor ray-gen: ndc through pixel centers (jitter 0.5)."""
    xs = (np.arange(width) + 0.5) / width
    ys = (np.arange(height) + 0.5) / height
    ndc_x = 2.0 * xs - 1.0
    ndc_y = -2.0 * ys + 1.0
    d = (
        ndc_x[None, :, None] * cam_u[None, None, :]
        + ndc_y[:, None, None] * cam_v[None, None, :]
        + cam_w[None, None, :]
    ).reshape(-1, 3)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cam_pos, d.shape).copy()
    return o, d


def cosine_sample(n, rs):
    """Cosine-weighted hemisphere around n (own construction)."""
    m = n.shape[0]
    u1 = rs.uniform(size=m)
    u2 = rs.uniform(size=m)
    r = np.sqrt(u1)
    phi = 2.0 * np.pi * u2
    # build tangent frame
    a = np.where(np.abs(n[:, 2:3]) < 0.9, np.array([[0.0, 0.0, 1.0]]),
                 np.array([[1.0, 0.0, 0.0]]))
    t = np.cross(a, n)
    t = t / np.linalg.norm(t, axis=1, keepdims=True)
    b = np.cross(n, t)
    z = np.sqrt(np.maximum(1.0 - u1, 0.0))
    return (
        (r * np.cos(phi))[:, None] * t
        + (r * np.sin(phi))[:, None] * b
        + z[:, None] * n
    )


def clamp(v):
    return np.clip(v, 0.0, CLAMP_UPPER)


def render_depth1(width, height, cam_pos, cam_u, cam_v, cam_w):
    """Deterministic: direct(v1)/2, clamped.  Background pixels -> 0 rgb
    contribution from the estimator (pipeline shows env there)."""
    o, d = camera_rays(width, height, cam_pos, cam_u, cam_v, cam_w)
    t, n, alb, hit = intersect(o, d)
    p = _advance(o, t, d)
    out = np.zeros((o.shape[0], 3))
    out[hit] = clamp(direct_light(p[hit], n[hit], alb[hit]) / 2.0)
    return out.reshape(height, width, 3), hit.reshape(height, width)


def render_depth2(width, height, cam_pos, cam_u, cam_v, cam_w, spp, seed=0):
    """E[direct(v1)/2 + albedo1*direct(v2)/3], clamped per sample."""
    rs = np.random.RandomState(seed)
    o, d = camera_rays(width, height, cam_pos, cam_u, cam_v, cam_w)
    t, n1, alb1, hit = intersect(o, d)
    p1 = _advance(o, t, d)
    term1 = np.zeros((o.shape[0], 3))
    term1[hit] = clamp(direct_light(p1[hit], n1[hit], alb1[hit]) / 2.0)

    acc = np.zeros((o.shape[0], 3))
    ph, nh, ah = p1[hit], n1[hit], alb1[hit]
    for _ in range(spp):
        l = cosine_sample(nh, rs)
        t2, n2, alb2, hit2 = intersect(ph, l)
        p2 = _advance(ph, t2, l)
        contrib = np.zeros_like(ph)
        if hit2.any():
            contrib[hit2] = direct_light(p2[hit2], n2[hit2], alb2[hit2])
        # lambertian sampleBRDF weight = albedo (cos/pdf cancels with the
        # reference's missing 1/pi — MaterialUtils.hlsli:309-329)
        sample = np.zeros((o.shape[0], 3))
        sample[hit] = clamp(ah * contrib / 3.0)
        acc += sample
    return (term1 + acc / spp).reshape(height, width, 3), hit.reshape(height, width)


# ---------------- estimator 2 (light tracing) oracle ----------------

def _ball_sample(rs, n):
    """Uniform point in the unit ball (rejection, like MaterialUtils
    unit-sphere loop — the pipeline's unit_sphere_sample)."""
    p = rs.rand(n, 3) * 2.0 - 1.0
    bad = (p ** 2).sum(1) > 1.0
    while bad.any():
        p[bad] = rs.rand(int(bad.sum()), 3) * 2.0 - 1.0
        bad = (p ** 2).sum(1) > 1.0
    return p


def _cos_hemi_reference(rs, axis):
    """getCosHemisphereSample with a possibly UNNORMALIZED axis (the
    reference quirk: sampleLight feeds the raw ball point as the lobe axis,
    BDPTUtils.hlsli:140-152 + MaterialUtils.hlsli:41-54)."""
    n = len(axis)
    a = np.abs(axis)
    xm = ((a[:, 0] - a[:, 1]) < 0) & ((a[:, 0] - a[:, 2]) < 0)
    ym = np.where(xm, False, (a[:, 1] - a[:, 2]) < 0)
    zm = ~(xm | ym)
    pick = np.stack([xm, ym, zm], 1).astype(np.float64)
    bit = np.cross(axis, pick)
    bit /= np.linalg.norm(bit, axis=1, keepdims=True)
    tan = np.cross(bit, axis)  # length = |axis| (bit is unit, perp to axis)
    u0 = rs.rand(n)
    u1 = rs.rand(n)
    r = np.sqrt(u0)
    phi = 2.0 * np.pi * u1
    return (tan * (r * np.cos(phi))[:, None]
            + bit * (r * np.sin(phi))[:, None]
            + axis * np.sqrt(np.maximum(0.0, 1.0 - u0))[:, None])


def _project_to_pixel(dirs, cam_pos, cam_u, cam_v, cam_w, width, height):
    """getLaunchIndexFromDirection (BDPTUtils.hlsli:129-138), jitter 0.5."""
    d1 = dirs @ cam_u / (cam_u @ cam_u)
    d2 = dirs @ cam_v / (cam_v @ cam_v)
    d3 = dirs @ cam_w / (cam_w @ cam_w)
    ndc_x = d1 / d3
    ndc_y = -d2 / d3
    px = (ndc_x * 0.5 + 0.5) * width - 0.5
    py = (ndc_y * 0.5 + 0.5) * height - 0.5
    # np.rint = round-half-to-even, same as jnp.round
    return np.rint(px).astype(np.int64), np.rint(py).astype(np.int64)


def render_est2(width, height, cam_pos, cam_u, cam_v, cam_w, frames, seed=0):
    """Light-tracing-only frames, averaged (estimator 2, depth-1 light
    subpath): each frame traces one light path per VALID camera pixel (the
    reference's background early-out skips every estimator for launch
    indices whose primary ray missed, BDPTMain.rt.hlsl:62-66), splats
    intensity * albedo * G / 2 (clamped) at the camera-projected pixel, and
    saturates the frame like the pipeline (bdpt_pass est-2 block).  Shares
    no code with the pipeline; equations from BDPTMain.rt.hlsl:171-208."""
    rs = np.random.RandomState(seed)
    cam_o, cam_d = camera_rays(width, height, cam_pos, cam_u, cam_v, cam_w)
    _, _, _, cam_hit = intersect(cam_o, cam_d)
    n_paths = int(cam_hit.sum())
    camera_n = cam_w / np.linalg.norm(cam_w)
    acc = np.zeros((height * width, 3))
    for _ in range(frames):
        axis = _ball_sample(rs, n_paths)
        d = _cos_hemi_reference(rs, axis)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(LIGHT_POS.astype(np.float64), (n_paths, 3))
        t, n, alb, hit = intersect(o, d)
        x = _advance(o, t, d)
        to_cam = cam_pos[None, :] - x
        dis = np.linalg.norm(to_cam, axis=1)
        dirc = to_cam / dis[:, None]
        facing = dirc @ camera_n < 0.0
        vis = shadow_visible(x, dis, dirc)
        g = (np.clip(np.abs(dirc @ camera_n), 0, 1)
             * np.clip(np.abs((dirc * n).sum(1)), 0, 1) / (dis * dis))
        shade = clamp(LIGHT_INTENSITY[None, :] * alb * g[:, None] / 2.0)
        ix, iy = _project_to_pixel(dirc, cam_pos, cam_u, cam_v, cam_w,
                                   width, height)
        ok = (hit & facing & vis
              & (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height))
        frame = np.zeros((height * width, 3))
        np.add.at(frame, (iy * width + ix)[ok], shade[ok])
        acc += np.clip(frame, 0.0, 1.0)
    return (acc / frames).reshape(height, width, 3)


def render_est3(width, height, cam_pos, cam_u, cam_v, cam_w, frames, seed=0):
    """Connection-estimator-only frames at depth 2 (single s=1,t=1 pair),
    averaged.  Per valid camera pixel and frame: one light subpath
    (reference ball-axis cosine start, BDPTMain.rt.hlsl:120-135), connect
    its first surface vertex to the pixel's primary hit, and add
      aL * fsL * G * fsE * aE * (1/totalLength)
    when the connection ray is unoccluded (getUnweightedContribution,
    BDPTUtils.hlsli:186-224; uniform 1/totalLength weight,
    BDPTMain.rt.hlsl:228).  Lambertian evalFs is the plain albedo (the
    reference omits 1/pi, MaterialUtils.hlsli:309-314); aE =
    cameraPath[0].color = 1, aL = lightPath[0].color = intensity.  Shares
    no code with the pipeline."""
    rs = np.random.RandomState(seed)
    cam_o, cam_d = camera_rays(width, height, cam_pos, cam_u, cam_v, cam_w)
    t_c, n_c, alb_c, cam_hit = intersect(cam_o, cam_d)
    x_c = _advance(cam_o, t_c, cam_d)
    idx = np.nonzero(cam_hit)[0]
    n_paths = idx.shape[0]
    acc = np.zeros((height * width, 3))
    for _ in range(frames):
        axis = _ball_sample(rs, n_paths)
        d = _cos_hemi_reference(rs, axis)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(LIGHT_POS.astype(np.float64), (n_paths, 3))
        t_l, n_l, alb_l, hit_l = intersect(o, d)
        x_l = _advance(o, t_l, d)

        vec = x_l - x_c[idx]
        r2 = np.maximum((vec * vec).sum(1), 1e-30)
        r = np.sqrt(r2)
        dirc = vec / r[:, None]
        g = (np.abs((n_c[idx] * dirc).sum(1))
             * np.abs((n_l * dirc).sum(1)) / r2)
        shade = (LIGHT_INTENSITY[None, :] * alb_l * g[:, None]
                 * alb_c[idx]) * 0.5
        shade = clamp(shade)
        vis = shadow_visible(x_c[idx], r, dirc)
        frame = np.zeros((height * width, 3))
        frame[idx[hit_l & vis]] = shade[hit_l & vis]
        acc += np.clip(frame, 0.0, 1.0)
    return (acc / frames).reshape(height, width, 3)
