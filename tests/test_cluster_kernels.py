"""Equivalence tests for the two-level clustered kernels
(accel/pallas_cluster.py) against brute force / lane kernels (interpret
mode, CPU).  Uses a multi-cluster scene (many icospheres) so the AABB
culling path actually skips clusters, plus the small-cluster edge case
(ck > n_tris)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.accel import pallas_cluster as pc
from fyp_bidirectionalpathtracer_tpu.accel import pallas_lane as lane
from fyp_bidirectionalpathtracer_tpu.accel.traverse import intersect_brute
from fyp_bidirectionalpathtracer_tpu.models.procedural import (
    MaterialDesc,
    cornell_box,
    icosphere,
)
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene


@pytest.fixture(scope="module")
def spheres():
    """~2.5k-triangle scene: a 4x3 grid of icospheres (each ~320 tris after
    1 subdiv x 80? -> subdivisions=1 gives 80 tris; use 2 -> 320)."""
    s = Scene()
    s.materials = [
        MaterialDesc(base_color=(0.8, 0.3, 0.3, 1.0)),
        MaterialDesc(base_color=(0.3, 0.8, 0.3, 1.0), specular=(0, 0.4, 0.6, 0)),
    ]
    for i in range(4):
        for j in range(2):
            s.meshes.append(
                icosphere(
                    (i * 1.5, j * 1.5, 2.0 + 0.3 * ((i + j) % 3)),
                    0.5,
                    (i + j) % 2,
                    subdivisions=2,
                )
            )
    s.lights = [{"type": "point", "pos": (2.0, 4.0, -2.0),
                 "intensity": (10.0, 10.0, 10.0)}]
    return s.apply_default_fixups().bake()


def _rays(n, seed=0, spread=4.0):
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(-1.0, spread, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def test_cluster_occlusion_matches_brute(spheres):
    n_tris = int(spheres.tris.v0.shape[0])
    assert n_tris > pc.CK, n_tris  # actually multi-cluster
    o, d = _rays(600)
    tmax = jnp.full((600,), 3.0)
    occ = pc.occluded_clusters(spheres.tris, o, d, 1e-3, t_max=tmax)
    hb = intersect_brute(spheres.tris, o, d, 1e-3, t_max=tmax)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hb.hit))


def test_cluster_shaded_matches_brute(spheres):
    o, d = _rays(600, seed=2)
    tp = pc.pack_shaded_tris_cluster(spheres.tris, spheres.data.materials)
    ab = pc.pack_cluster_aabbs(spheres.tris)
    h1, f1 = pc.intersect_shaded_clusters(spheres.tris, tp, ab, o, d, 1e-3)
    hb = intersect_brute(spheres.tris, o, d, 1e-3)
    tri0, tri1 = np.asarray(hb.tri), np.asarray(h1.tri)
    t0, t1 = np.asarray(hb.t), np.asarray(h1.t)
    differs = tri0 != tri1
    if differs.any():  # edge ties only
        np.testing.assert_allclose(t0[differs], t1[differs], rtol=1e-4)
    agree = ~differs
    hit = (tri0 >= 0) & agree
    np.testing.assert_allclose(t0[hit], t1[hit], rtol=1e-4, atol=1e-5)


def test_cluster_matches_lane_fields(spheres):
    """Field tables agree with the (dense) lane kernel on the same scene."""
    o, d = _rays(600, seed=3)
    tp = pc.pack_shaded_tris_cluster(spheres.tris, spheres.data.materials)
    ab = pc.pack_cluster_aabbs(spheres.tris)
    h1, f1 = pc.intersect_shaded_clusters(spheres.tris, tp, ab, o, d, 1e-3)
    lp = lane.pack_shaded_tris_lane(spheres.tris, spheres.data.materials)
    h0, f0 = lane.intersect_shaded_lanes(spheres.tris, lp, o, d, 1e-3)
    agree = np.asarray(h0.tri) == np.asarray(h1.tri)
    hit = (np.asarray(h0.tri) >= 0) & agree
    np.testing.assert_allclose(
        np.asarray(f0)[hit], np.asarray(f1)[hit], atol=2e-4
    )


def test_cluster_lean_closest_matches_brute(spheres):
    """Lean [T,16]-pack closest-hit (the 32k-131k tier) vs brute."""
    o, d = _rays(600, seed=5)
    h1 = pc.intersect_closest_clusters(spheres.tris, o, d, 1e-3)
    hb = intersect_brute(spheres.tris, o, d, 1e-3)
    tri0, tri1 = np.asarray(hb.tri), np.asarray(h1.tri)
    t0, t1 = np.asarray(hb.t), np.asarray(h1.t)
    differs = tri0 != tri1
    if differs.any():
        np.testing.assert_allclose(t0[differs], t1[differs], rtol=1e-4)
    hit = (tri0 >= 0) & ~differs
    np.testing.assert_allclose(t0[hit], t1[hit], rtol=1e-4, atol=1e-5)
    # barycentrics agree where winners agree
    np.testing.assert_allclose(
        np.asarray(hb.bary_u)[hit], np.asarray(h1.bary_u)[hit], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(hb.bary_v)[hit], np.asarray(h1.bary_v)[hit], atol=2e-4
    )


def test_cluster_hbm_matches_vmem(spheres):
    """HBM demand-paged kernels (DMA per visited cluster) vs the VMEM
    variants."""
    o, d = _rays(600, seed=6)
    tmax = jnp.full((600,), 3.0)
    occ_h = pc.occluded_clusters_hbm(spheres.tris, o, d, 1e-3, t_max=tmax)
    occ_v = pc.occluded_clusters(spheres.tris, o, d, 1e-3, t_max=tmax)
    np.testing.assert_array_equal(np.asarray(occ_h), np.asarray(occ_v))

    h_h = pc.intersect_closest_clusters_hbm(spheres.tris, o, d, 1e-3)
    h_v = pc.intersect_closest_clusters(spheres.tris, o, d, 1e-3)
    np.testing.assert_array_equal(np.asarray(h_h.tri), np.asarray(h_v.tri))
    np.testing.assert_allclose(np.asarray(h_h.t), np.asarray(h_v.t),
                               rtol=1e-6)


@pytest.mark.slow
def test_sorted_wavefront_matches_unsorted(spheres):
    """coherent=False Morton-sorts rays through the cluster kernels and
    inverse-permutes the results — must be a pure permutation identity."""
    from fyp_bidirectionalpathtracer_tpu.ops.raysort import (
        make_permutation,
        ray_sort_keys,
        scene_bounds,
    )

    o, d = _rays(600, seed=7)
    lo, hi = scene_bounds(spheres.tris)
    perm, inv = make_permutation(ray_sort_keys(o, d, lo, hi))
    np.testing.assert_array_equal(
        np.asarray(perm)[np.asarray(inv)], np.arange(600)
    )

    from fyp_bidirectionalpathtracer_tpu.accel.traverse import (
        make_intersector,
    )

    # force the cluster branch on CPU (interpret mode) so the sorted code
    # path itself is exercised, not just the kwarg plumbing
    intersect = make_intersector(
        spheres.data.bvh, spheres.tris, materials=spheres.data.materials,
        force_cluster=True,
    )
    h0 = intersect(o, d, 1e-3, closest=True)
    h1 = intersect(o, d, 1e-3, closest=True, coherent=False)
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t), rtol=1e-6)

    tmax = jnp.full((600,), 2.5)
    o0 = intersect(o, d, 1e-3, t_max=tmax, closest=False).hit
    o1 = intersect(o, d, 1e-3, t_max=tmax, closest=False,
                   coherent=False).hit
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_cluster_single_cluster_edge_case():
    """Cornell (36 tris < CK): one padded cluster must still be exact."""
    cornell = Scene.from_built(cornell_box()).bake()
    o, d = _rays(300, seed=4, spread=0.95)
    o = jnp.clip(o, 0.05, 0.95)
    tp = pc.pack_shaded_tris_cluster(cornell.tris, cornell.data.materials)
    ab = pc.pack_cluster_aabbs(cornell.tris)
    h1, _ = pc.intersect_shaded_clusters(cornell.tris, tp, ab, o, d, 1e-3)
    hb = intersect_brute(cornell.tris, o, d, 1e-3)
    agree = np.asarray(hb.tri) == np.asarray(h1.tri)
    assert agree.mean() > 0.99
    occ = pc.occluded_clusters(cornell.tris, o, d, 1e-3,
                               t_max=jnp.full((300,), 0.4))
    hb2 = intersect_brute(cornell.tris, o, d, 1e-3,
                          t_max=jnp.full((300,), 0.4))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hb2.hit))


def test_fm_variant_matches_row_major(spheres):
    """Field-major kernel wrappers + planar decode are bitwise-identical to
    the row-major path (pure layout change)."""
    from fyp_bidirectionalpathtracer_tpu.ops.shading import (
        shading_from_fields,
        shading_from_fields_fm,
    )

    o, d = _rays(600, seed=7)
    tp = pc.pack_shaded_tris_cluster(spheres.tris, spheres.data.materials)
    ab = pc.pack_cluster_aabbs(spheres.tris)
    h0, f0 = pc.intersect_shaded_clusters(spheres.tris, tp, ab, o, d, 1e-3)
    h1, f1 = pc.intersect_shaded_clusters_fm(spheres.tris, tp, ab, o, d, 1e-3)
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(jnp.moveaxis(f1, 0, -1)))
    atlas = spheres.data.textures
    view = jnp.zeros((3,))
    sd0 = shading_from_fields(f0, atlas, h0, o, d, view)
    sd1 = shading_from_fields_fm(f1, atlas, h1, o, d, view)
    for k in ("pos_w", "n", "diffuse", "specular", "roughness", "emissive",
              "ior", "n_dot_v", "material_id", "uv", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sd0, k)), np.asarray(getattr(sd1, k)), err_msg=k
        )

    lp = lane.pack_shaded_tris_lane(spheres.tris, spheres.data.materials)
    hl0, fl0 = lane.intersect_shaded_lanes(spheres.tris, lp, o, d, 1e-3)
    hl1, fl1 = lane.intersect_shaded_lanes_fm(spheres.tris, lp, o, d, 1e-3)
    np.testing.assert_array_equal(np.asarray(hl0.tri), np.asarray(hl1.tri))
    np.testing.assert_array_equal(
        np.asarray(fl0), np.asarray(jnp.moveaxis(fl1, 0, -1))
    )


@pytest.mark.slow
def test_proxy_seed_matches_unseeded(spheres):
    """Proxy-t seeding (pack_proxy_tris) must not change closest-hit
    results: the proxy block's winner is a real (id, t) answer and the
    main loop only improves on it."""
    tp = pc.pack_shaded_tris_cluster(spheres.tris, spheres.data.materials)
    ab = pc.pack_cluster_aabbs(spheres.tris)
    proxy = pc.pack_proxy_tris(spheres.tris, 128)
    o, d = _rays(700, seed=3)
    h0, f0 = pc.intersect_shaded_clusters(spheres.tris, tp, ab, o, d, 1e-3)
    h1, f1 = pc.intersect_shaded_clusters(
        spheres.tris, tp, ab, o, d, 1e-3, proxy_pack=proxy
    )
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)

    # lean kernel path
    h2 = pc.intersect_closest_clusters(spheres.tris, o, d, 1e-3)
    h3 = pc.intersect_closest_clusters(
        spheres.tris, o, d, 1e-3, proxy_pack=proxy
    )
    np.testing.assert_array_equal(np.asarray(h2.tri), np.asarray(h3.tri))
    np.testing.assert_allclose(np.asarray(h2.t), np.asarray(h3.t), atol=1e-6)

    # HBM-paged path
    h4 = pc.intersect_closest_clusters_hbm(
        spheres.tris, o, d, 1e-3, proxy_pack=proxy
    )
    np.testing.assert_array_equal(np.asarray(h2.tri), np.asarray(h4.tri))


def test_sorted_tracer_matches_unsorted(spheres):
    """make_shaded_tracer's direction-major sorted divergent path must give
    the same hits/shading as the unsorted cluster path (the sort is a pure
    permutation; the split inverse gathers must reassemble every channel)."""
    from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer

    o, d = _rays(600, seed=5)
    plain = make_shaded_tracer(spheres, force_cluster=True,
                               sort_divergent=False)
    srt = make_shaded_tracer(spheres, force_cluster=True, sort_divergent=True)
    h0, sd0 = plain(o, d, 1e-3, o, coherent=False)
    h1, sd1 = srt(o, d, 1e-3, o, coherent=False)
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t), atol=1e-6)
    for name in ("pos_w", "n", "v", "diffuse", "specular", "roughness",
                 "emissive", "opacity", "uv", "n_dot_v", "material_id"):
        a, b = getattr(sd0, name), getattr(sd1, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)

    # lean mode (shoot_ray's projection): hit flag + the sample_brdf inputs
    # must survive the single 11-column inverse sort
    h2, sd2 = srt(o, d, 1e-3, o, coherent=False, lean=True)
    np.testing.assert_array_equal(np.asarray(h0.hit), np.asarray(h2.hit))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h2.t), atol=1e-6)
    for name in ("pos_w", "n", "v", "diffuse", "specular", "roughness",
                 "n_dot_v"):
        a, b = getattr(sd0, name), getattr(sd2, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg="lean " + name)

    # lean_bf16: the 6-column bf16x2-packed inverse sort must agree within
    # the bf16 envelope (t/hit stay exact f32; normals renormalized)
    srt16 = make_shaded_tracer(spheres, force_cluster=True,
                               sort_divergent=True, lean_bf16=True)
    h3, sd3 = srt16(o, d, 1e-3, o, coherent=False, lean=True)
    np.testing.assert_array_equal(np.asarray(h0.hit), np.asarray(h3.hit))
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h3.t), atol=1e-6)
    for name, tol in (("n", 6e-3), ("diffuse", 6e-3), ("specular", 6e-3),
                      ("roughness", 1e-2), ("pos_w", 1e-5)):
        a, b = getattr(sd0, name), getattr(sd3, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=tol, rtol=6e-3,
            err_msg="lean_bf16 " + name)


def test_const_origin_sorted_anyhit_matches(spheres):
    """The const_origin sort-payload shortcut (accel/traverse.sort_wavefront:
    rebuild the shared origin after the sort instead of carrying 3 payload
    columns) must be invisible: same occlusion bits as the general path for
    a single-origin wavefront (the reversed est-2 shadow batch shape)."""
    inter = spheres.intersector()
    rs = np.random.RandomState(7)
    n = 700
    o = jnp.broadcast_to(jnp.asarray([2.0, 1.0, -2.0], jnp.float32), (n, 3))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((n,), 6.0)
    h_gen = inter(o, d, 1e-3, tmax, closest=False, coherent=False)
    h_const = inter(o, d, 1e-3, tmax, closest=False, coherent=False,
                    const_origin=True)
    np.testing.assert_array_equal(np.asarray(h_gen.hit),
                                  np.asarray(h_const.hit))


def test_sorted_anyhit_dead_lane_tail_packing(spheres):
    """Pre-masked (empty-interval) shadow lanes sort to the key tail
    (accel/traverse.sort_wavefront); occlusion bits must still match the
    unsorted path exactly, with dead lanes reporting unoccluded."""
    inter = spheres.intersector()
    rs = np.random.RandomState(3)
    n = 640
    o, d = _rays(n, seed=9)
    tmax = jnp.asarray(
        np.where(rs.rand(n) < 0.6, 0.0, 4.0).astype(np.float32))
    h0 = inter(o, d, 1e-3, t_max=tmax, closest=False)
    h1 = inter(o, d, 1e-3, t_max=tmax, closest=False, coherent=False)
    np.testing.assert_array_equal(np.asarray(h0.hit), np.asarray(h1.hit))
    assert not np.asarray(h1.hit)[np.asarray(tmax) == 0.0].any()


def test_sub_cell_rows_match_default(spheres, monkeypatch):
    """FYP_CELL_ROWS=2 (256-ray sort cells -> tighter exact shortlists,
    accel.pallas_cluster.cell_rows) must produce IDENTICAL results to the
    default 1024-ray cells: the shortlist is conservative at any
    granularity and the pair tests are unchanged."""
    o, d = _rays(900, seed=7)
    tmax = jnp.full((900,), 4.0)
    tp = pc.pack_shaded_tris_cluster(spheres.tris, spheres.data.materials)
    lp = pc.pack_tris_cluster(spheres.tris)
    ab = pc.pack_cluster_aabbs(spheres.tris)

    occ8 = pc.occluded_clusters(spheres.tris, o, d, 1e-3, t_max=tmax,
                                tri_pack=lp, aabbs=ab)
    h8, f8 = pc.intersect_shaded_clusters(spheres.tris, tp, ab, o, d, 1e-3)
    c8 = pc.intersect_closest_clusters(spheres.tris, o, d, 1e-3,
                                       tri_pack=lp, aabbs=ab)
    monkeypatch.setenv("FYP_CELL_ROWS", "2")
    occ2 = pc.occluded_clusters(spheres.tris, o, d, 1e-3, t_max=tmax,
                                tri_pack=lp, aabbs=ab)
    h2, f2 = pc.intersect_shaded_clusters(spheres.tris, tp, ab, o, d, 1e-3)
    c2 = pc.intersect_closest_clusters(spheres.tris, o, d, 1e-3,
                                       tri_pack=lp, aabbs=ab)
    np.testing.assert_array_equal(np.asarray(occ8), np.asarray(occ2))
    np.testing.assert_array_equal(np.asarray(h8.tri), np.asarray(h2.tri))
    # winners/t/occlusion are bit-identical; the decoded attribute fields
    # go through free-form arithmetic the two (differently-shaped) compiled
    # programs may reassociate differently — ulp-level tolerance
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c8.tri), np.asarray(c2.tri))
    np.testing.assert_array_equal(np.asarray(c8.t), np.asarray(c2.t))


def test_bounce_tex_mean_uses_material_means():
    """bounce_tex_mean (utils/config.BDPTConfig): lean bounce decodes shade
    with the per-material MEAN texture colors baked into the material
    constants (scene.Scene.bake), tap-free; lean=False keeps exact taps.
    Reference taps per vertex (BDPTUtils.hlsli:2-53) — deviation is
    documented in PARITY.md."""
    from fyp_bidirectionalpathtracer_tpu.models.procedural import textured_room
    from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene

    baked = Scene.from_built(textured_room()).bake()
    tr_mean = make_shaded_tracer(baked, force_cluster=True,
                                 bounce_tex_mean=True, lean_bf16=False,
                                 sort_divergent=True)
    tr_exact = make_shaded_tracer(baked, force_cluster=True,
                                  bounce_tex_mean=False, lean_bf16=False,
                                  sort_divergent=True)
    o, d = _rays(600, seed=11, spread=2.0)
    vo = jnp.zeros(3, jnp.float32)
    hit_m, sd_m = tr_mean(o, d, 1e-3, vo, coherent=False, lean=True)
    hit_e, sd_e = tr_exact(o, d, 1e-3, vo, coherent=False, lean=True)
    np.testing.assert_array_equal(np.asarray(hit_m.t), np.asarray(hit_e.t))
    dm = np.asarray(sd_m.diffuse)
    de = np.asarray(sd_e.diffuse)
    assert np.isfinite(dm).all()
    hits = np.asarray(hit_m.hit)
    # textured walls: exact taps vary per texel, means are constant per
    # material — the two must genuinely differ somewhere...
    assert np.abs(dm[hits] - de[hits]).max() > 1e-3
    # ...but agree in aggregate (the mean IS the texture average)
    assert abs(dm[hits].mean() - de[hits].mean()) < 0.1
    # and the mean-path diffuse takes few distinct values (per material)
    assert len(np.unique(np.round(dm[hits], 5))) < 64


@pytest.mark.slow
def test_bounce_tex_mean_image_deviation_bounded():
    """Image-space bound on the production bounce_tex_mean approximation
    (VERDICT r4 item 3): a full BDPT frame decoded with mean-albedo bounces
    must stay within a PSNR envelope of the reference-exact per-vertex-tap
    frame under IDENTICAL seeds (so Monte-Carlo noise cancels and only the
    approximation differs).  The tracked converged numbers live in
    BASELINE.md (40.0 dB textured / 54.3 dB pink_room at 720p); this pins
    the mechanism at test scale so a regression that silently widens the
    deviation fails."""
    from fyp_bidirectionalpathtracer_tpu.models.procedural import (
        textured_room,
    )
    from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
    from fyp_bidirectionalpathtracer_tpu.passes import bdpt as bdpt_mod
    from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gb
    from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig

    w, h = 64, 40
    baked = Scene.from_built(textured_room(), aspect=w / h).bake()
    cfg = BDPTConfig(max_depth=3)
    imgs = {}
    for mean in (True, False):
        trace = make_shaded_tracer(
            baked, force_cluster=True, sort_divergent=True, lean_bf16=False,
            bounce_tex_mean=mean,
        )
        jitter = gb.pixel_jitter_for_frame(jnp.uint32(0x1337), "msaa8")
        ch = gb.ray_traced_gbuffer(
            baked, trace, w, h, jnp.uint32(0xDEADBEEF), jitter)
        img = bdpt_mod.bdpt_pass(
            baked, baked.intersector(), ch, jnp.uint32(0x1337), jitter, cfg,
            trace=trace,
        )
        imgs[mean] = np.asarray(img[..., :3])
    diff = imgs[True] - imgs[False]
    assert np.abs(diff).max() > 0.0  # the approximation genuinely engages
    mse = float(np.mean(diff ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    # single-frame unaccumulated bound; converged multi-frame PSNR is
    # higher (BASELINE.md round-4/5 numbers)
    assert psnr >= 25.0, f"bounce_tex_mean deviation too large: {psnr:.1f} dB"
