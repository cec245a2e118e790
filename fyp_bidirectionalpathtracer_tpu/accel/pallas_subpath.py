"""Subpath-construction megakernel (EXPERIMENTAL — correct but not wired in).

Builds an ENTIRE BDPT subpath (all extension bounces) for a block of rays in
ONE Pallas kernel: per bounce it intersects the VMEM-resident scene, decodes
the winning triangle's shading constants, runs the GGX/Lambert BRDF sampler
with an in-kernel LCG, and records the PathVertex — the fused form of the
reference's per-bounce TraceRay -> closesthit -> sampleBRDF loop
(BDPTMain.rt.hlsl:106-112, globalIlluminationRay.hlsli).

STATUS (v5e, 1280x720 Cornell, measured): 146 ms for a 3-bounce subpath vs
36 ms for three per-bounce pair-tile kernels (accel.pallas_shaded).  The
scalar-broadcast triangle loop costs ~46 VPU ops/triangle and Mosaic streams
every op through VMEM (vector registers hold only one (8,128) tile), so the
kernel is VMEM-bandwidth bound; the pair-tile layout amortizes the same work
across 128 triangle lanes and keeps the dot products on the MXU.  Kept (with
an exact-equivalence test vs passes.bdpt.shoot_ray) as the starting point for
a register-blocked revision; the production path remains the per-bounce
kernels.

Layout: every per-ray field is an [8, 128] native VPU tile (1024 rays per
grid cell), stored field-major as [F, N/128, 128] arrays.  Triangles loop as
*scalars* broadcast against the ray tile — no [rays x tris] pair tile at all,
so per-ray math (the sampler) runs at full lane utilization.  Suited to
scenes of up to a few hundred triangles and *untextured* materials (a
kernel limitation — the reference samples textures at mip 0 at every path
vertex, BDPTUtils.hlsli:2-53; texture scenes fall back to the per-bounce
kernels whose XLA-side packed gathers vectorize).

Per-triangle constants come from the Baldwin-Weber shaded pack
(accel.pallas_shaded.pack_shaded_triangles) TRANSPOSED to [T_pad, 48]:
  0:12 BW rows, 12:21 n0 n1 n2, 21:27 uv, 27:31 base rgba, 31:35 spec rgba,
  35:38 emissive, 38 ior, 39 shading_model, 40 double_sided, 41:44 tex ids,
  44 mat id.

The reference quirks are kept: a miss bounce records the STALE payload
geometry with zeroed color; `faithful_rng` reuses the same three draws each
bounce (by-value seed, MaterialUtils.hlsli:130).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 64
LANE = 128
RAYS_PER_CELL = SUB * LANE

M_PI = 3.14159265358979323846
M_1_PI = 0.318309886183790671538

VERT_ROWS = 24   # color3 pos3 n3 v3 dif3 spec3 rough isspec pdf hit take pad
STATE_ROWS = 12  # o3 d3 color3 term seedbits min_t

# attribute rows fetched for the winner (see module docstring layout)
_FETCH_ROWS = tuple(range(4, 21)) + tuple(range(27, 35)) + (39, 40)


def _next_rand(seed):
    """LCG draw on an [8,128] uint32 tile (BDPTUtils.hlsli:106-110).

    Mosaic can't cast uint32->f32 directly; the masked value is < 2^24 so a
    bitcast to int32 followed by an int cast is exact.
    """
    seed = seed * jnp.uint32(1664525) + jnp.uint32(1013904223)
    bits = pltpu.bitcast(seed & jnp.uint32(0x00FFFFFF), jnp.int32)
    u = bits.astype(jnp.float32) * jnp.float32(1.0 / 0x01000000)
    return seed, u


def _perpendicular(ux, uy, uz):
    ax, ay, az = jnp.abs(ux), jnp.abs(uy), jnp.abs(uz)
    xm = ((ax - ay) < 0) & ((ax - az) < 0)
    # NOTE: jnp.where(xm, False, cond) materializes an i8 bool constant that
    # Mosaic cannot truncate back to i1 — use boolean algebra instead.
    ym = (~xm) & ((ay - az) < 0)
    zm = ~(xm | ym)
    bx = xm.astype(jnp.float32)
    by = ym.astype(jnp.float32)
    bz = zm.astype(jnp.float32)
    return uy * bz - uz * by, uz * bx - ux * bz, ux * by - uy * bx


def _normalize3(x, y, z, eps=1e-20):
    inv = jax.lax.rsqrt(x * x + y * y + z * z + eps)
    return x * inv, y * inv, z * inv


def _luminance(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def _sample_brdf_tiles(seed, n, v, dif, spec, rough, mat_model: int):
    """In-kernel sampleBRDF on tiles.  Returns (seed, weight3, l3, pdf,
    is_spec, below).  Mirrors ops.materials.sample_brdf numerics."""
    nx_s, ny_s, nz_s = n
    vx, vy, vz = v
    dif_r, dif_g, dif_b = dif
    sp_r, sp_g, sp_b = spec

    # the Lambertian sampler consumes only the 2 directional draws; the lobe
    # pick is GGX-only (MaterialUtils.hlsli:130-141)
    if mat_model == 0:
        seed, u_lobe = _next_rand(seed)
    seed, su0 = _next_rand(seed)
    seed, su1 = _next_rand(seed)

    bx, by, bz = _perpendicular(nx_s, ny_s, nz_s)
    bx, by, bz = _normalize3(bx, by, bz)
    tx = by * nz_s - bz * ny_s
    ty = bz * nx_s - bx * nz_s
    tz = bx * ny_s - by * nx_s

    r_ = jnp.sqrt(su0)
    phi = 2.0 * M_PI * su1
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    zc = jnp.sqrt(jnp.maximum(0.0, 1.0 - su0))
    ldx = tx * (r_ * cphi) + bx * (r_ * sphi) + nx_s * zc
    ldy = ty * (r_ * cphi) + by * (r_ * sphi) + ny_s * zc
    ldz = tz * (r_ * cphi) + bz * (r_ * sphi) + nz_s * zc

    if mat_model != 0:  # Lambertian
        ndl = jnp.clip(nx_s * ldx + ny_s * ldy + nz_s * ldz, 0.0, 1.0)
        pdf = ndl * M_1_PI
        zeros = jnp.zeros_like(pdf, dtype=bool)
        return seed, (dif_r, dif_g, dif_b), (ldx, ldy, ldz), pdf, zeros, zeros

    lum_d = jnp.maximum(0.01, _luminance(dif_r, dif_g, dif_b))
    lum_s = jnp.maximum(0.01, _luminance(sp_r, sp_g, sp_b))
    prob_diff = lum_d / (lum_d + lum_s)
    choose_diff = u_lobe < prob_diff

    a2 = rough * rough
    cos_th = jnp.sqrt(jnp.maximum(0.0, (1.0 - su0) / ((a2 - 1.0) * su0 + 1.0)))
    sin_th = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_th * cos_th))
    phi_h = su1 * M_PI * 2.0
    cph = jnp.cos(phi_h)
    sph = jnp.sin(phi_h)
    hx = tx * (sin_th * cph) + bx * (sin_th * sph) + nx_s * cos_th
    hy = ty * (sin_th * cph) + by * (sin_th * sph) + ny_s * cos_th
    hz = tz * (sin_th * cph) + bz * (sin_th * sph) + nz_s * cos_th
    vdh = vx * hx + vy * hy + vz * hz
    sdx = 2.0 * vdh * hx - vx
    sdy = 2.0 * vdh * hy - vy
    sdz = 2.0 * vdh * hz - vz
    sdx, sdy, sdz = _normalize3(sdx, sdy, sdz)

    lx = jnp.where(choose_diff, ldx, sdx)
    ly = jnp.where(choose_diff, ldy, sdy)
    lz = jnp.where(choose_diff, ldz, sdz)
    ndl_any = nx_s * lx + ny_s * ly + nz_s * lz
    below = ndl_any <= 0.0
    ndl = jnp.clip(ndl_any, 0.0, 1.0)
    ndv_c = jnp.clip(nx_s * vx + ny_s * vy + nz_s * vz, 0.0, 1.0)

    pdf_diff = ndl * M_1_PI * prob_diff

    ndh = jnp.clip(nx_s * hx + ny_s * hy + nz_s * hz, 0.0, 1.0)
    ldh = jnp.clip(sdx * hx + sdy * hy + sdz * hz, 0.0, 1.0)
    ndl_s = jnp.clip(nx_s * sdx + ny_s * sdy + nz_s * sdz, 0.0, 1.0)
    dd = (ndh * a2 - ndh) * ndh + 1.0
    big_d = a2 / jnp.maximum(0.001, dd * dd * M_PI)
    k = rough * rough / 2.0
    g_v = ndv_c / (ndv_c * (1.0 - k) + k)
    g_l = ndl_s / (ndl_s * (1.0 - k) + k)
    big_g = g_v * g_l
    f5 = jnp.power(jnp.maximum(0.0, 1.0 - ldh), 5.0)
    ggx_prob = big_d * ndh / (4.0 * ldh)
    gterm = big_d * big_g / (4.0 * ndl_s * ndv_c)
    scale = ndl_s / (ggx_prob * (1.0 - prob_diff))
    ws_r = scale * gterm * (sp_r + (1.0 - sp_r) * f5)
    ws_g = scale * gterm * (sp_g + (1.0 - sp_g) * f5)
    ws_b = scale * gterm * (sp_b + (1.0 - sp_b) * f5)
    pdf_spec = ggx_prob * (1.0 - prob_diff)

    pdf = jnp.where(choose_diff, pdf_diff, pdf_spec)
    w_r = jnp.where(choose_diff, dif_r / prob_diff, ws_r)
    w_g = jnp.where(choose_diff, dif_g / prob_diff, ws_g)
    w_b = jnp.where(choose_diff, dif_b / prob_diff, ws_b)
    pdf = jnp.where(below, 0.0, pdf)
    w_r = jnp.where(below, 0.0, w_r)
    w_g = jnp.where(below, 0.0, w_g)
    w_b = jnp.where(below, 0.0, w_b)
    return seed, (w_r, w_g, w_b), (lx, ly, lz), pdf, ~choose_diff, below


def subpath_kernel(state_ref, tri_ref, verts_ref, out_state_ref, *,
                   n_bounces: int, n_tris: int, mat_model: int,
                   faithful_rng: bool):
    ox = state_ref[0]
    oy = state_ref[1]
    oz = state_ref[2]
    dx = state_ref[3]
    dy = state_ref[4]
    dz = state_ref[5]
    cr = state_ref[6]
    cg = state_ref[7]
    cb = state_ref[8]
    term = state_ref[9] > 0.5
    seed = pltpu.bitcast(state_ref[10], jnp.uint32)
    min_t = state_ref[11]

    zero = jnp.zeros((SUB, LANE), jnp.float32)
    # carried payload geometry (stale-on-miss semantics)
    p_pos = [ox, oy, oz]
    p_n = [zero, zero, zero]
    p_v = [zero, zero, zero]
    p_dif = [zero, zero, zero]
    p_spec = [zero, zero, zero]
    p_rough = zero
    p_isspec = zero
    p_pdf = zero

    for bounce in range(n_bounces):
        active = ~term

        best_t = jnp.full((SUB, LANE), 1e30, jnp.float32)
        best_id = jnp.full((SUB, LANE), -1, jnp.int32)
        for t_i in range(n_tris):
            nx = tri_ref[t_i, 0]
            ny = tri_ref[t_i, 1]
            nz = tri_ref[t_i, 2]
            nv0 = tri_ref[t_i, 3]
            ndir = nx * dx + ny * dy + nz * dz
            dir_ok = jnp.abs(ndir) > 1e-9
            inv_nd = 1.0 / jnp.where(dir_ok, ndir, 1.0)
            tt = (nv0 - (nx * ox + ny * oy + nz * oz)) * inv_nd
            r1x = tri_ref[t_i, 4]
            r1y = tri_ref[t_i, 5]
            r1z = tri_ref[t_i, 6]
            u = (r1x * ox + r1y * oy + r1z * oz - tri_ref[t_i, 7]) + tt * (
                r1x * dx + r1y * dy + r1z * dz
            )
            r2x = tri_ref[t_i, 8]
            r2y = tri_ref[t_i, 9]
            r2z = tri_ref[t_i, 10]
            v_ = (r2x * ox + r2y * oy + r2z * oz - tri_ref[t_i, 11]) + tt * (
                r2x * dx + r2y * dy + r2z * dz
            )
            ok = (
                dir_ok & (u >= 0.0) & (v_ >= 0.0) & (u + v_ <= 1.0)
                & (tt > min_t) & (tt < best_t)
            )
            best_t = jnp.where(ok, tt, best_t)
            best_id = jnp.where(ok, t_i, best_id)

        hit = best_id >= 0

        # fetch winner rows
        a = {k: zero for k in _FETCH_ROWS}
        for t_i in range(n_tris):
            sel = best_id == t_i
            for k in _FETCH_ROWS:
                a[k] = jnp.where(sel, tri_ref[t_i, k], a[k])

        u = (a[4] * ox + a[5] * oy + a[6] * oz - a[7]) + best_t * (
            a[4] * dx + a[5] * dy + a[6] * dz
        )
        v_ = (a[8] * ox + a[9] * oy + a[10] * oz - a[11]) + best_t * (
            a[8] * dx + a[9] * dy + a[10] * dz
        )
        w = 1.0 - u - v_

        px = ox + best_t * dx
        py = oy + best_t * dy
        pz = oz + best_t * dz

        nx_s = w * a[12] + u * a[15] + v_ * a[18]
        ny_s = w * a[13] + u * a[16] + v_ * a[19]
        nz_s = w * a[14] + u * a[17] + v_ * a[20]
        nx_s, ny_s, nz_s = _normalize3(nx_s, ny_s, nz_s)

        vx, vy, vz = -dx, -dy, -dz  # normalize(rayOrigin - hit) for dir unit

        b_r, b_g, b_b = a[27], a[28], a[29]
        s_r, s_g, s_b, s_a = a[31], a[32], a[33], a[34]
        metal_rough = a[39] == 0.0  # SHADING_METAL_ROUGH
        metal = s_b
        dif_r = jnp.where(metal_rough, b_r * (1.0 - metal), b_r)
        dif_g = jnp.where(metal_rough, b_g * (1.0 - metal), b_g)
        dif_b = jnp.where(metal_rough, b_b * (1.0 - metal), b_b)
        sp_r = jnp.where(metal_rough, 0.04 * (1.0 - metal) + b_r * metal, s_r)
        sp_g = jnp.where(metal_rough, 0.04 * (1.0 - metal) + b_g * metal, s_g)
        sp_b = jnp.where(metal_rough, 0.04 * (1.0 - metal) + b_b * metal, s_b)
        lr = jnp.maximum(0.08, jnp.where(metal_rough, s_g, 1.0 - s_a))
        rough = lr * lr

        ndv = nx_s * vx + ny_s * vy + nz_s * vz
        flip = (ndv <= 0) & (a[40] > 0.5)
        nx_s = jnp.where(flip, -nx_s, nx_s)
        ny_s = jnp.where(flip, -ny_s, ny_s)
        nz_s = jnp.where(flip, -nz_s, nz_s)

        seed0 = seed
        seed, wgt, l, pdf, is_spec, _below = _sample_brdf_tiles(
            seed, (nx_s, ny_s, nz_s), (vx, vy, vz),
            (dif_r, dif_g, dif_b), (sp_r, sp_g, sp_b), rough, mat_model,
        )
        if faithful_rng:
            seed = seed0
        else:
            seed = jnp.where(hit & active, seed, seed0)

        got = active & hit
        missed = active & ~hit

        cr = jnp.where(got, cr * wgt[0], jnp.where(missed, 0.0, cr))
        cg = jnp.where(got, cg * wgt[1], jnp.where(missed, 0.0, cg))
        cb = jnp.where(got, cb * wgt[2], jnp.where(missed, 0.0, cb))
        sel3 = lambda new, old: [jnp.where(got, n_, o_) for n_, o_ in zip(new, old)]  # noqa: E731
        p_pos = sel3([px, py, pz], p_pos)
        p_n = sel3([nx_s, ny_s, nz_s], p_n)
        p_v = sel3([vx, vy, vz], p_v)
        p_dif = sel3([dif_r, dif_g, dif_b], p_dif)
        p_spec = sel3([sp_r, sp_g, sp_b], p_spec)
        p_rough = jnp.where(got, rough, p_rough)
        p_isspec = jnp.where(got, is_spec.astype(jnp.float32), p_isspec)
        p_pdf = jnp.where(got, pdf, p_pdf)
        ox = jnp.where(got, px, ox)
        oy = jnp.where(got, py, oy)
        oz = jnp.where(got, pz, oz)
        dx = jnp.where(got, l[0], dx)
        dy = jnp.where(got, l[1], dy)
        dz = jnp.where(got, l[2], dz)
        term = term | missed

        # vertex record (cameraPath[depth+1] = create(payload); zeros if the
        # lane was already terminated before this bounce)
        base = bounce * VERT_ROWS
        af = active.astype(jnp.float32)
        fields = [
            cr, cg, cb,
            p_pos[0], p_pos[1], p_pos[2],
            p_n[0], p_n[1], p_n[2],
            p_v[0], p_v[1], p_v[2],
            p_dif[0], p_dif[1], p_dif[2],
            p_spec[0], p_spec[1], p_spec[2],
            p_rough, p_isspec, p_pdf,
            got.astype(jnp.float32),
            (~term).astype(jnp.float32),
            zero,
        ]
        for k, f_ in enumerate(fields):
            verts_ref[base + k] = f_ * af if k < 23 else f_
        # take flag: lanes inactive before the bounce keep 1 (reference init)
        verts_ref[base + 22] = jnp.where(active, (~term).astype(jnp.float32), 1.0)

    out_state_ref[0] = ox
    out_state_ref[1] = oy
    out_state_ref[2] = oz
    out_state_ref[3] = dx
    out_state_ref[4] = dy
    out_state_ref[5] = dz
    out_state_ref[6] = cr
    out_state_ref[7] = cg
    out_state_ref[8] = cb
    out_state_ref[9] = term.astype(jnp.float32)
    out_state_ref[10] = pltpu.bitcast(seed, jnp.float32)
    out_state_ref[11] = min_t


@functools.partial(
    jax.jit,
    static_argnames=("n_bounces", "n_tris", "mat_model", "faithful_rng", "interpret"),
)
def _launch(state, tri_pack_t, n_bounces, n_tris, mat_model, faithful_rng, interpret):
    n_cols = state.shape[1]  # N/128 rows of 128 lanes
    grid = (n_cols // SUB,)
    kernel = functools.partial(
        subpath_kernel, n_bounces=n_bounces, n_tris=n_tris,
        mat_model=mat_model, faithful_rng=faithful_rng,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((STATE_ROWS, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_pack_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_bounces * VERT_ROWS, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STATE_ROWS, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_bounces * VERT_ROWS, n_cols, LANE), jnp.float32),
            jax.ShapeDtypeStruct((STATE_ROWS, n_cols, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(state, tri_pack_t)


def build_subpath(
    tri_pack,           # [48, T_pad] from pack_shaded_triangles
    n_tris: int,
    origin,             # [...,3]
    direction,          # [...,3]
    color,              # [...,3]
    seed,               # [...] uint32
    terminated,         # [...] bool
    min_t,
    n_bounces: int,
    mat_model: int,
    faithful_rng: bool,
    interpret: bool | None = None,
):
    """Run the subpath kernel over a ray wavefront.

    Returns (verts, final) where verts is a list of n_bounces dicts of
    [...]-shaped fields (color, pos, n, v, dif, spec [..3], rough, is_spec,
    pdf, hit, take) and final = dict(origin, direction, color, seed,
    terminated).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = origin.shape[:-1]
    n = 1
    for s in shape:
        n *= s
    n_pad = max(RAYS_PER_CELL, ((n + RAYS_PER_CELL - 1) // RAYS_PER_CELL) * RAYS_PER_CELL)
    n_cols = n_pad // LANE

    def pack_field(x, width):
        flat = x.reshape(n, width) if width > 1 else x.reshape(n, 1)
        flat = jnp.pad(flat.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                       constant_values=1.0 if x is terminated else 0.0)
        return flat.T.reshape(width, n_cols, LANE)

    state = jnp.concatenate(
        [
            pack_field(origin, 3),
            pack_field(direction, 3),
            pack_field(color, 3),
            pack_field(terminated.astype(jnp.float32), 1),
            pack_field(
                jax.lax.bitcast_convert_type(seed, jnp.float32), 1
            ),
            jnp.broadcast_to(
                jnp.asarray(min_t, jnp.float32), (1, n_cols, LANE)
            ),
        ],
        axis=0,
    )
    tri_pack_t = tri_pack.T  # [T_pad, 48]
    verts_arr, final_arr = _launch(
        state, tri_pack_t, n_bounces, n_tris, mat_model, faithful_rng, interpret
    )

    def unpack_row(arr, r, width=1):
        rows = arr[r:r + width]                    # [w, n_cols, LANE]
        flat = rows.reshape(width, n_pad).T[:n]    # [n, w]
        if width == 1:
            return flat[:, 0].reshape(shape)
        return flat.reshape(shape + (width,))

    verts = []
    for b in range(n_bounces):
        base = b * VERT_ROWS
        verts.append(
            {
                "color": unpack_row(verts_arr, base + 0, 3),
                "pos": unpack_row(verts_arr, base + 3, 3),
                "n": unpack_row(verts_arr, base + 6, 3),
                "v": unpack_row(verts_arr, base + 9, 3),
                "dif": unpack_row(verts_arr, base + 12, 3),
                "spec": unpack_row(verts_arr, base + 15, 3),
                "rough": unpack_row(verts_arr, base + 18),
                "is_spec": unpack_row(verts_arr, base + 19) > 0.5,
                "pdf": unpack_row(verts_arr, base + 20),
                "hit": unpack_row(verts_arr, base + 21) > 0.5,
                "take": unpack_row(verts_arr, base + 22) > 0.5,
            }
        )
    final = {
        "origin": unpack_row(final_arr, 0, 3),
        "direction": unpack_row(final_arr, 3, 3),
        "color": unpack_row(final_arr, 6, 3),
        "terminated": unpack_row(final_arr, 9) > 0.5,
        "seed": jax.lax.bitcast_convert_type(unpack_row(final_arr, 10), jnp.uint32),
    }
    return verts, final
