import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.passes import bmfr
from fyp_bidirectionalpathtracer_tpu.utils.config import BMFRConfig

H = W = 64


def _flat_scene_channels(color_fn, seed=0):
    """Synthetic planar G-buffer: plane z=1, camera at origin."""
    rs = np.random.RandomState(seed)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    u = (xs + 0.5) / W * 2 - 1
    # clip-space y points up: uvy = (1 - v)/2 must land back on row ys
    v = 1 - (ys + 0.5) / H * 2
    pos = np.stack([u, v, np.ones_like(u), np.ones_like(u)], -1).astype(np.float32)
    norm = np.zeros((H, W, 4), np.float32)
    norm[..., 2] = -1.0
    albedo = np.full((H, W, 4), 0.5, np.float32)
    clean = color_fn(u, v)
    noisy = clean + rs.normal(0, 0.25, clean.shape).astype(np.float32)
    noisy4 = np.concatenate([noisy, np.ones((H, W, 1), np.float32)], -1)
    return (
        jnp.asarray(pos),
        jnp.asarray(norm),
        jnp.asarray(albedo),
        jnp.asarray(np.clip(noisy4, 0, None)),
        jnp.asarray(clean),
    )


def test_mirror_addressing():
    idx = jnp.asarray([-3, -1, 0, 5, 63, 64, 66])
    out = np.asarray(bmfr._mirror(idx, 64))
    np.testing.assert_array_equal(out, [2, 0, 0, 5, 63, 63, 61])
    assert np.all((out >= 0) & (out < 64))


def test_hash_random_range():
    r = np.asarray(bmfr._hash_random(jnp.arange(1000)))
    assert np.all((r >= 0) & (r < 1))
    assert 0.4 < r.mean() < 0.6


@pytest.mark.parametrize("frame", [0, 3, 9, 15])
def test_block_features_match_mirror_gather(frame):
    """The pad+dynamic_slice window path must equal the reference's
    per-pixel mirror-addressed fetch (regressionCP.hlsl:104-124) bit-for-bit."""
    rs = np.random.RandomState(7)
    pos, norm, albedo, noisy = (
        jnp.asarray(rs.rand(H, W, 4).astype(np.float32)) for _ in range(4)
    )
    import jax

    n_bx = (W + 31) // 32 + 1
    n_by = (H + 31) // 32 + 1
    # the pad + dynamic_slice window path used by bmfr.regression
    off = bmfr.BLOCK_OFFSETS[jnp.int32(frame) % 16]
    tab_j = jnp.concatenate(
        [pos[..., :3], norm[..., :3], albedo[..., :3], noisy[..., :3]], -1
    )
    padded = jnp.pad(
        tab_j, ((bmfr._PAD_L, bmfr._PAD_R), (bmfr._PAD_L, bmfr._PAD_R), (0, 0)),
        mode="symmetric",
    )
    win = jax.lax.dynamic_slice(
        padded, (bmfr._PAD_L + off[1], bmfr._PAD_L + off[0], 0),
        (n_by * 32, n_bx * 32, 12),
    )
    feats, alb = bmfr._features_from_window(win, n_by, n_bx)
    # direct numpy mirror-gather oracle
    offx, offy = np.asarray(bmfr.BLOCK_OFFSETS)[frame % 16]
    tab = np.concatenate(
        [np.asarray(x)[..., :3] for x in (pos, norm, albedo, noisy)], -1
    )
    bid = np.arange(n_bx * n_by)
    pid = np.arange(1024)
    px = (bid % n_bx)[:, None] * 32 + pid[None, :] % 32 + offx
    py = (bid // n_bx)[:, None] * 32 + pid[None, :] // 32 + offy
    mx = np.asarray(bmfr._mirror(jnp.asarray(px), W))
    my = np.asarray(bmfr._mirror(jnp.asarray(py), H))
    row = tab.reshape(-1, 12)[my * W + mx]
    np.testing.assert_array_equal(np.asarray(alb), row[..., 6:9])
    np.testing.assert_array_equal(np.asarray(feats[..., 1:4]), row[..., 3:6])
    np.testing.assert_array_equal(np.asarray(feats[..., 4:7]), row[..., 0:3])


@pytest.mark.parametrize("remove_ld", [True, False])
def test_regression_denoises_linear_signal(remove_ld):
    """A signal linear in the features must be recovered almost exactly."""
    def color_fn(u, v):
        # linear in world position -> inside the regression's model class
        c = np.stack([0.3 + 0.2 * u, 0.5 - 0.1 * v, 0.4 + 0.05 * (u + v)], -1)
        return np.clip(c, 0, None).astype(np.float32)

    pos, norm, albedo, noisy4, clean = _flat_scene_channels(color_fn)
    cfg = BMFRConfig(half_screen_debug=False, remove_ld_features=remove_ld)
    out = np.asarray(
        bmfr.regression(pos, norm, albedo, noisy4, jnp.int32(0), cfg)
    )
    err_out = np.abs(out[..., :3] - clean).mean()
    err_in = np.abs(np.asarray(noisy4)[..., :3] - clean).mean()
    assert np.isfinite(out).all()
    assert err_out < 0.25 * err_in  # strong noise reduction


def test_regression_rank_deficient_stable():
    """Constant position plane (features collapse) must not blow up."""
    pos = jnp.ones((H, W, 4), jnp.float32)
    norm = jnp.zeros((H, W, 4), jnp.float32).at[..., 2].set(1.0)
    albedo = jnp.full((H, W, 4), 0.5, jnp.float32)
    rs = np.random.RandomState(1)
    noisy = jnp.asarray(
        np.abs(rs.normal(0.4, 0.2, (H, W, 4))).astype(np.float32)
    )
    for remove_ld in (True, False):
        cfg = BMFRConfig(half_screen_debug=False, remove_ld_features=remove_ld)
        out = np.asarray(bmfr.regression(pos, norm, albedo, noisy, jnp.int32(2), cfg))
        assert np.isfinite(out).all(), f"remove_ld={remove_ld}"


def test_preprocess_static_camera_accumulates():
    """With an identity reprojection and matching history, spp grows."""
    pos, norm, albedo, noisy4, clean = _flat_scene_channels(lambda u, v: np.full((H, W, 3), 0.5, np.float32))
    state = bmfr.BMFRState.create(H, W)
    # prev == cur (static camera), frame 1
    state = state.replace(
        prev_pos=pos, prev_norm=norm, prev_noisy=noisy4,
        frame_number=jnp.asarray(1, jnp.int32),
    )
    # view-proj that projects x,y in [-1,1] onto the screen: the synthetic
    # plane was built exactly in NDC, so identity works.
    vp = jnp.eye(4)
    cfg = BMFRConfig(half_screen_debug=False)
    out, accept, prev_pix, _ = bmfr.preprocess(state, pos, norm, noisy4, vp, cfg)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # most pixels accept history -> spp == 2
    acc = np.asarray(accept)
    assert (acc > 0).mean() > 0.9
    assert (out[..., 3] >= 2.0 - 1e-5).mean() > 0.8


def test_preprocess_first_frame_passthrough():
    pos, norm, albedo, noisy4, _ = _flat_scene_channels(lambda u, v: np.full((H, W, 3), 0.5, np.float32))
    state = bmfr.BMFRState.create(H, W)
    cfg = BMFRConfig(half_screen_debug=False)
    out, accept, _, _ = bmfr.preprocess(state, pos, norm, noisy4, jnp.eye(4), cfg)
    np.testing.assert_allclose(np.asarray(out)[..., :3], np.asarray(noisy4)[..., :3], atol=1e-6)
    assert np.all(np.asarray(accept) == 0)
    assert np.all(np.asarray(out)[..., 3] == 1.0)


def test_postprocess_blends_history():
    filtered = jnp.full((H, W, 4), 0.8, jnp.float32).at[..., 3].set(10.0)
    state = bmfr.BMFRState.create(H, W).replace(
        prev_filtered=jnp.full((H, W, 4), 0.2, jnp.float32),
        frame_number=jnp.asarray(3, jnp.int32),
    )
    accept = jnp.full((H, W), 0b1111, jnp.int32)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    prev_pix = jnp.stack([xs, ys], -1)
    cfg = BMFRConfig(half_screen_debug=False)
    out = np.asarray(bmfr.postprocess(state, filtered, accept, prev_pix, cfg))
    # alpha = max(1/10, 0.1) = 0.1 -> 0.1*0.8 + 0.9*0.2 = 0.26
    np.testing.assert_allclose(out[5, 5, :3], 0.26, rtol=1e-4)


def test_half_screen_gate():
    pos, norm, albedo, noisy4, _ = _flat_scene_channels(lambda u, v: np.full((H, W, 3), 0.5, np.float32))
    state = bmfr.BMFRState.create(H, W).replace(
        prev_pos=pos, prev_norm=norm, prev_noisy=noisy4,
        frame_number=jnp.asarray(1, jnp.int32),
    )
    cfg = BMFRConfig(half_screen_debug=True)
    out, _, _, _ = bmfr.preprocess(state, pos, norm, noisy4, jnp.eye(4), cfg)
    # right half passes through unchanged
    np.testing.assert_array_equal(
        np.asarray(out)[:, (W + 1) // 2:], np.asarray(noisy4)[:, (W + 1) // 2:]
    )


def test_history_pack_bf16_matches_f32():
    """The combined bf16x2 history fetch (BMFRConfig.history_pack='bf16':
    28 i32 cols, 2 gathers) must reproduce the exact f32 path within bf16
    quantization of the history (<= 2^-8 relative), with identical accept
    decisions away from the thresholds, over a multi-frame run with
    cross-pixel motion."""
    import types

    def color_fn(u, v):
        return np.stack([0.5 + 0.4 * u, 0.5 - 0.3 * v, 0.4 + 0.2 * u * v],
                        -1).astype(np.float32)

    outs = {}
    for pack in ("f32", "bf16"):
        cfg = BMFRConfig(enabled=True, preprocess=True, regression=True,
                         postprocess=True, half_screen_debug=False,
                         history_pack=pack)
        state = bmfr.BMFRState.create(H, W)
        for frame in range(3):
            pos, norm, albedo, noisy4, _ = _flat_scene_channels(
                color_fn, seed=frame)
            pvp = jnp.eye(4).at[1, 3].set(-0.004 * frame)
            cam = types.SimpleNamespace(prev_view_proj=pvp)
            channels = {"WorldPosition": pos, "WorldNormal": norm,
                        "MaterialDiffuse": albedo, "Accumulated": noisy4}
            state, out = bmfr.bmfr_pass(state, channels, cam, cfg)
        outs[pack] = np.asarray(out)
    # bf16 mantissa is 8 bits; accumulated drift stays O(2^-7) absolute here
    np.testing.assert_allclose(outs["bf16"], outs["f32"], atol=2e-2)
    assert np.mean(np.abs(outs["bf16"] - outs["f32"])) < 3e-3


def test_normal_eq_solver_matches_qr():
    """regression_solver='normal' (Gram + skip-Cholesky) must reproduce the
    Householder QR weights to f32 tolerance, including rank-deficient
    blocks where the 0.01 pivot skip engages, for both the IGNORE_LD and
    add-noise variants (utils/config.BMFRConfig.regression_solver)."""
    rs = np.random.RandomState(11)
    b = 8
    a = rs.rand(b, bmfr.BLOCK_PIXELS, bmfr.BUFFERS).astype(np.float32)
    a[:, :, 0] = 1.0
    # make some blocks rank-deficient: col 5 duplicates col 4, col 8 constant
    a[:4, :, 5] = a[:4, :, 4]
    a[2:6, :, 8] = 0.25
    x = jnp.asarray(a)

    w_qr = np.asarray(bmfr._householder_qr_skip_ld(x))
    w_ne = np.asarray(bmfr._normal_eq_skip_ld(x))
    # the solved FIT is the comparable quantity; weights of near-dependent
    # columns are individually ill-conditioned, so compare fitted colors
    f = np.asarray(x)[..., :bmfr.FEATURES]
    fit_qr = np.einsum("bpf,bfc->bpc", f, w_qr)
    fit_ne = np.einsum("bpf,bfc->bpc", f, w_ne)
    np.testing.assert_allclose(fit_ne, fit_qr, atol=5e-3)

    w_qr_n = np.asarray(bmfr._householder_qr_noise(x, jnp.int32(7), 0.01))
    w_ne_n = np.asarray(bmfr._normal_eq_noise(x, jnp.int32(7), 0.01))
    fit_qr_n = np.einsum("bpf,bfc->bpc", f, w_qr_n)
    fit_ne_n = np.einsum("bpf,bfc->bpc", f, w_ne_n)
    np.testing.assert_allclose(fit_ne_n, fit_qr_n, atol=5e-3)
    # accepted-pivot pattern must match exactly (zero rows for skips)
    np.testing.assert_array_equal(w_qr == 0.0, w_ne == 0.0)
