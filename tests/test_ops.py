import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.core import rng
from fyp_bidirectionalpathtracer_tpu.ops import brdf, materials, texture, tonemap
from fyp_bidirectionalpathtracer_tpu.scene.lights import make_light_array


def test_ggx_ndf_normalization():
    """Integral over hemisphere of D(h) cos(theta_h) dw == 1."""
    rough = 0.3  # alpha
    n = 512
    theta = (np.arange(n) + 0.5) * (np.pi / 2) / n
    d = np.asarray(brdf.ggx_normal_distribution(jnp.cos(jnp.asarray(theta)), rough))
    integral = np.sum(d * np.cos(theta) * np.sin(theta)) * (np.pi / 2 / n) * 2 * np.pi
    assert integral == pytest.approx(1.0, rel=0.02)


def test_schlick_fresnel_limits():
    f0 = jnp.asarray([[0.04, 0.04, 0.04]])
    at0 = np.asarray(brdf.schlick_fresnel(f0, jnp.asarray([1.0])))
    at90 = np.asarray(brdf.schlick_fresnel(f0, jnp.asarray([0.0])))
    np.testing.assert_allclose(at0[0], 0.04, atol=1e-6)
    np.testing.assert_allclose(at90[0], 1.0, atol=1e-6)


def test_sample_ggx_weight_consistency():
    """weight == evalBRDF * NdotL / pdf on sampled directions (diffuse lobe
    exact; specular uses the same identity)."""
    n = 4096
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    v = jnp.broadcast_to(jnp.asarray([0.0, 0.6, 0.8]), (n, 3))
    dif = jnp.broadcast_to(jnp.asarray([0.5, 0.4, 0.3]), (n, 3))
    spec = jnp.broadcast_to(jnp.asarray([0.3, 0.3, 0.3]), (n, 3))
    rough = jnp.full((n,), 0.25)
    _, w, l, pdf, is_spec = materials.sample_ggx_brdf(seeds, normal, normal, v, dif, spec, rough)
    f = materials.eval_ggx_brdf(v, l, normal, normal, dif, spec, rough, is_spec)
    ndl = jnp.clip(jnp.sum(normal * l, -1), 0, 1)
    lhs = np.asarray(w)
    rhs = np.asarray(f * (ndl / jnp.maximum(pdf, 1e-9))[..., None])
    ok = np.asarray(pdf) > 1e-5
    np.testing.assert_allclose(lhs[ok], rhs[ok], rtol=2e-2, atol=1e-3)


def test_lambertian_furnace():
    """Cosine-sampled albedo estimator integrates to albedo (white furnace)."""
    n = 8192
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    dif = jnp.broadcast_to(jnp.asarray([0.7, 0.7, 0.7]), (n, 3))
    _, w, l, pdf, _ = materials.sample_lambertian_brdf(seeds, normal, dif)
    # estimator: (albedo/pi) * cos / pdf, pdf = cos/pi -> albedo exactly
    est = np.asarray(w)
    np.testing.assert_allclose(est.mean(axis=0), 0.7, atol=1e-4)


def test_eval_direct_unshadowed_point_light():
    lights = make_light_array(
        [{"type": "point", "pos": (0, 2, 0), "intensity": (5, 5, 5)}]
    )
    n = 4
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0))
    pos = jnp.zeros((n, 3))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    dif = jnp.full((n, 3), 0.6)

    def shadow_fn(o, d, tmin, tmax):
        return jnp.ones(o.shape[:-1], bool)

    _, c = materials.lambertian_direct(seeds, shadow_fn, lights, 1e-3, pos, normal, dif)
    # NdotL=1, falloff=1/(1e-4+4), intensity 5 -> 5/4.0001 * 0.6/pi
    want = 5.0 / 4.0001 * 0.6 / np.pi
    np.testing.assert_allclose(np.asarray(c), want, rtol=1e-4)


def test_pick_light_uniform():
    n = 10000
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(11))
    _, idx = materials.pick_light(seeds, jnp.asarray(3, jnp.int32))
    counts = np.bincount(np.asarray(idx), minlength=3)
    assert counts.min() > n / 3 * 0.9
    assert np.all(np.asarray(idx) < 3)


def test_texture_bilinear_exact_at_texels():
    atlas = jnp.arange(2 * 4 * 4 * 4, dtype=jnp.float32).reshape(2, 4, 4, 4)
    # sample exactly at texel centers: uv = (x+0.5)/4
    uv = jnp.asarray([[(1 + 0.5) / 4, (2 + 0.5) / 4]])
    out = texture.sample_atlas_bilinear(atlas, jnp.asarray([1]), uv)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(atlas[1, 2, 1]), rtol=1e-6)


def test_texture_constant_fallback():
    from fyp_bidirectionalpathtracer_tpu.scene.types import TextureAtlas

    atlas = TextureAtlas(
        data=jnp.ones((1, 4, 4, 4)), sizes=jnp.asarray([[4, 4]], jnp.int32)
    )
    const = jnp.asarray([[0.1, 0.2, 0.3, 0.4]])
    out = texture.sample_or_constant(atlas, jnp.asarray([-1]), jnp.zeros((1, 2)), const)
    np.testing.assert_allclose(np.asarray(out), np.asarray(const))


def test_texture_packed_matches_four_tap():
    # the wrap-packed one-gather bilinear path must be exact vs the 4-tap form
    rs = np.random.RandomState(3)
    data = rs.uniform(0, 1, (3, 8, 8, 4)).astype(np.float32)
    rx = np.roll(data, -1, axis=2)
    ry = np.roll(data, -1, axis=1)
    rxy = np.roll(rx, -1, axis=1)
    packed = jnp.asarray(np.concatenate([data, rx, ry, rxy], -1))
    slot = jnp.asarray(rs.randint(0, 3, 64), jnp.int32)
    uv = jnp.asarray(rs.uniform(-1.5, 2.5, (64, 2)), jnp.float32)
    ref = texture.sample_atlas_bilinear(jnp.asarray(data), slot, uv)
    got = texture.sample_atlas_bilinear_packed(packed, slot, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("op", list(tonemap.OPERATOR_NAMES.values()))
def test_tonemap_range(op):
    img = jnp.asarray(np.random.RandomState(0).uniform(0, 8, (8, 8, 3)), jnp.float32)
    out = np.asarray(tonemap.tone_map(img, op))
    assert out.shape == img.shape
    assert np.all(out >= 0) and np.all(out <= 1 + 1e-6)
    assert np.all(np.isfinite(out))


def test_clamp_vec():
    v = jnp.asarray([[-1.0, 0.5, 9.0]])
    np.testing.assert_allclose(
        np.asarray(materials.clamp_vec(v, 2.0)), [[0.0, 0.5, 2.0]]
    )


def test_splat_modes_agree():
    from fyp_bidirectionalpathtracer_tpu.ops.splat import (
        MODES,
        scatter_add_rgba_direct,
    )

    rs = np.random.RandomState(0)
    n = 1000
    u = 3000
    lin = jnp.asarray(rs.randint(0, n + 200, u), jnp.int32)  # some dropped
    rgb = jnp.asarray(np.abs(rs.normal(size=(u, 3))), jnp.float32)
    alpha = jnp.ones((u,), jnp.float32)
    d = np.asarray(scatter_add_rgba_direct(lin, rgb, alpha, n))
    for mode, fn in MODES.items():
        s = np.asarray(fn(lin, rgb, alpha, n))
        np.testing.assert_allclose(d, s, rtol=1e-3, atol=1e-3,
                                   err_msg=mode)  # f32 sum order
    from fyp_bidirectionalpathtracer_tpu.ops.splat import scatter_add_rgba

    p = np.asarray(scatter_add_rgba("packed", lin, rgb, alpha, n,
                                    alpha_is_count=True))
    np.testing.assert_allclose(d, p, rtol=1e-3, atol=1e-3)
    au = np.asarray(scatter_add_rgba("auto", lin, rgb, alpha, n,
                                     alpha_is_count=True))
    np.testing.assert_allclose(d, au, rtol=1e-3, atol=1e-3)
    # dropped updates contributed nothing
    total_kept = float(alpha[np.asarray(lin) < n].sum())
    assert float(d[:, 3].sum()) == total_kept


def test_splat_tiled_bf16_tolerance():
    """tiled_bf16 quantizes each UPDATE to bf16 (~0.4% rel) before the
    exact f32 per-pixel sum; totals must stay within that envelope and
    counts/drops must be exact (ops/splat_tile.py pack_bf16)."""
    from fyp_bidirectionalpathtracer_tpu.ops.splat import (
        scatter_add_rgba,
        scatter_add_rgba_direct,
    )

    rs = np.random.RandomState(1)
    n = 1000
    u = 3000
    lin = jnp.asarray(rs.randint(0, n + 200, u), jnp.int32)
    rgb = jnp.asarray(np.abs(rs.normal(size=(u, 3))), jnp.float32)
    alpha = jnp.ones((u,), jnp.float32)
    d = np.asarray(scatter_add_rgba_direct(lin, rgb, alpha, n))
    for count in (True, False):
        t = np.asarray(scatter_add_rgba("tiled_bf16", lin, rgb, alpha, n,
                                        alpha_is_count=count))
        np.testing.assert_allclose(d[:, :3], t[:, :3], rtol=6e-3, atol=6e-3)
        np.testing.assert_array_equal(d[:, 3], t[:, 3])  # alpha=1 is exact bf16
        # tiled_bf16w: on TPU the bf16 MXU products are exact (0/1 one-hot x
        # bf16 values) with f32 accumulation; the CPU interpret fallback may
        # round the partial dot to bf16, so assert the quantization envelope
        # rather than bit-equality here
        w = np.asarray(scatter_add_rgba("tiled_bf16w", lin, rgb, alpha, n,
                                        alpha_is_count=count))
        np.testing.assert_allclose(d[:, :3], w[:, :3], rtol=2e-2, atol=2e-2)
        np.testing.assert_array_equal(d[:, 3], w[:, 3])
    # rgb8e: one packed sort column, error <= 2^-8 of each update's MAX
    # channel (shared exponent) — assert against a per-pixel envelope of
    # sum(max_channel) * 2^-8
    w8 = np.asarray(scatter_add_rgba("tiled_rgb8e", lin, rgb, alpha, n,
                                     alpha_is_count=True))
    mx = np.asarray(rgb).max(-1)
    env = np.zeros(n)
    kept = np.asarray(lin) < n
    np.add.at(env, np.asarray(lin)[kept], mx[kept] * (2.0 ** -8))
    assert np.all(np.abs(d[:, :3] - w8[:, :3]) <= env[:, None] + 1e-6)
    np.testing.assert_array_equal(d[:, 3], w8[:, 3])


def test_splat_tiled_segments_agree():
    """segments>1 (per-depth batched sorts, ops/splat_tile.py) must equal
    the single-segment tiled reduction exactly for f32 pack and within the
    rgb8e envelope for the packed payload, across tile boundaries."""
    from fyp_bidirectionalpathtracer_tpu.ops.splat import (
        scatter_add_rgba_direct,
    )
    from fyp_bidirectionalpathtracer_tpu.ops.splat_tile import (
        scatter_add_rgba_tiled,
    )

    rs = np.random.RandomState(3)
    n = 3000          # spans 3 tiles of 1024
    u = 3 * 2000      # 3 segments
    # non-negative with some >= n dropped (production sentinel semantics:
    # direct's .at[] would WRAP negative ids Python-style, tiled drops them)
    lin = jnp.asarray(rs.randint(0, n + 200, u), jnp.int32)
    rgb = jnp.asarray(np.abs(rs.normal(size=(u, 3))), jnp.float32)
    alpha = jnp.ones((u,), jnp.float32)
    d = np.asarray(scatter_add_rgba_direct(lin, rgb, alpha, n))
    one = np.asarray(scatter_add_rgba_tiled(
        lin, rgb, alpha, n, alpha_is_count=True, interpret=True, segments=1))
    seg = np.asarray(scatter_add_rgba_tiled(
        lin, rgb, alpha, n, alpha_is_count=True, interpret=True, segments=3))
    np.testing.assert_allclose(d, one, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(one, seg, rtol=1e-5, atol=1e-5)
    r8 = np.asarray(scatter_add_rgba_tiled(
        lin, rgb, alpha, n, alpha_is_count=True, interpret=True, segments=3,
        pack="rgb8e", mxu_bf16=True))
    np.testing.assert_allclose(d[:, :3], r8[:, :3], rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(d[:, 3], r8[:, 3])


def test_compact_live_preserves_source_order():
    """ops.compact.compact_live: the compacted prefix must be exactly the
    live (key < n_targets) subsequence in source order — per-chunk stable
    bitonic partition + row-aligned overlapping writes with sentinel
    filler at the <=127-element chunk seams."""
    from fyp_bidirectionalpathtracer_tpu.ops.compact import K, compact_live

    rs = np.random.RandomState(7)
    n_targets = 2000
    sent = 2048  # next 1024-multiple
    for u, frac in ((2 * K, 0.15), (K + 1000, 0.5), (3 * K, 0.0)):
        live_mask = rs.rand(u) < frac
        keys = np.where(live_mask, rs.randint(0, n_targets, u), n_targets)
        pay = rs.randint(-(2 ** 31), 2 ** 31 - 1, u).astype(np.int64)
        ck, cp, n_pad = compact_live(
            jnp.asarray(keys, jnp.int32), jnp.asarray(pay, jnp.int32),
            n_targets, sent, interpret=True)
        ck, cp = np.asarray(ck), np.asarray(cp)
        n_pad = int(n_pad)
        # every live update appears once, in source order, before n_pad
        got = [(k, p) for k, p in zip(ck[:n_pad], cp[:n_pad])
               if k < n_targets]
        want = [(int(k), int(np.int32(p)))
                for k, p in zip(keys, pay) if k < n_targets]
        assert got == want, f"u={u} frac={frac}"
        # everything from n_pad on is sentinel
        assert np.all(ck[n_pad:] == sent)
        # padded live count bounded by chunk-seam rounding
        n_chunks = (u + K - 1) // K
        assert len(want) <= n_pad <= len(want) + 128 * n_chunks


def test_splat_tiled_compact_bit_identical():
    """The compaction fast path (rgb8e + capacity-gated sort) must be
    BIT-identical to the uncompacted tiled_rgb8e reduction — same live
    subsequence through the same stable sort — in both the fits-capacity
    branch and the overflow fallback branch."""
    from fyp_bidirectionalpathtracer_tpu.ops.splat_tile import (
        scatter_add_rgba_tiled,
    )

    rs = np.random.RandomState(11)
    n = 2000
    u = 3 * 8192
    for live_frac in (0.15, 0.9):  # 0.9 > 1/3 capacity -> fallback branch
        live = rs.rand(u) < live_frac
        lin = jnp.asarray(
            np.where(live, rs.randint(0, n, u), n), jnp.int32)
        rgb = jnp.asarray(np.abs(rs.normal(size=(u, 3))), jnp.float32)
        alpha = jnp.ones((u,), jnp.float32)
        kw = dict(alpha_is_count=True, interpret=True, pack="rgb8e",
                  mxu_bf16=True)
        off = np.asarray(scatter_add_rgba_tiled(
            lin, rgb, alpha, n, compact="off", **kw))
        on = np.asarray(scatter_add_rgba_tiled(
            lin, rgb, alpha, n, compact="on", **kw))
        np.testing.assert_array_equal(off, on, err_msg=f"frac={live_frac}")
