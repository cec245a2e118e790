import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.passes import gbuffer as gb
from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState, accumulate, camera_moved
from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import Renderer, make_cornell_renderer
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BMFRConfig, RenderConfig

SIZE = 64


@pytest.fixture(scope="module")
def baked():
    return Scene.from_built(cornell_box(), aspect=1.0).bake()


@pytest.fixture(scope="module")
def renderer(baked):
    r = Renderer(baked, RenderConfig(width=SIZE, height=SIZE))
    r.render(3)
    return r


def test_gbuffer_channels(baked):
    from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
    trace = make_shaded_tracer(baked)
    ch = gb.ray_traced_gbuffer(
        baked, trace, SIZE, SIZE, jnp.uint32(0), jnp.asarray([0.5, 0.5])
    )
    expected = {
        "WorldPosition", "WorldNormal", "MaterialDiffuse",
        "MaterialSpecRough", "MaterialExtraParams", "Emissive",
    }
    assert expected <= set(ch.keys())
    pos = np.asarray(ch["WorldPosition"])
    valid = pos[..., 3] != 0
    assert 0.3 < valid.mean() < 0.6  # box fills ~42% of the 59-deg view
    # hit points lie inside the box
    assert np.all(pos[valid][:, :3] >= -1e-3)
    assert np.all(pos[valid][:, :3] <= 1.0 + 1e-3)
    # normals are unit where valid
    n = np.asarray(ch["WorldNormal"])[valid][:, :3]
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
    # WorldNormal.w = distance to camera
    d = np.asarray(ch["WorldNormal"])[valid][:, 3]
    assert np.all((d > 0.3) & (d < 3.0))


def test_gbuffer_thin_lens_differs(baked):
    intersect = baked.intersector()
    from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
    trace = make_shaded_tracer(baked)
    pin = gb.ray_traced_gbuffer(
        baked, trace, SIZE, SIZE, jnp.uint32(0), jnp.asarray([0.5, 0.5])
    )
    thin = gb.ray_traced_gbuffer(
        baked, trace, SIZE, SIZE, jnp.uint32(0), jnp.asarray([0.5, 0.5]),
        use_thin_lens=True, lens_radius=0.05, focal_len=1.0,
    )
    assert np.any(np.asarray(pin["WorldPosition"]) != np.asarray(thin["WorldPosition"]))


def test_render_frame_finite_and_lit(renderer):
    img = np.asarray(renderer.channels["PipelineOutput"])
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0.05  # scene is lit
    assert img.shape == (SIZE, SIZE, 4)


@pytest.mark.slow
def test_progressive_accumulation_reduces_variance(baked):
    r = Renderer(baked, RenderConfig(width=SIZE, height=SIZE))
    f1 = np.asarray(r.render_frame())[..., :3]
    r.render(15)
    f16 = np.asarray(r.channels["Accumulated"])[..., :3]
    r2 = Renderer(baked, RenderConfig(width=SIZE, height=SIZE))
    r2.render(16)
    g16 = np.asarray(r2.channels["Accumulated"])[..., :3]
    # two independent runs of the same seeds agree exactly (determinism)
    np.testing.assert_array_equal(f16, g16)
    # variance between a 1-frame image and the 16-frame average shrinks
    # relative to frame-to-frame variance of single frames
    assert np.abs(f16 - f1).mean() > 0  # they differ


def test_accumulate_math():
    st = AccumState.create(2, 2)
    a = jnp.ones((2, 2, 4))
    b = jnp.zeros((2, 2, 4))
    st, out1 = accumulate(st, a, 100)
    np.testing.assert_allclose(np.asarray(out1), 1.0)
    st, out2 = accumulate(st, b, 100)
    np.testing.assert_allclose(np.asarray(out2), 0.5)  # (1*1 + 0)/2
    # cap: with max_accum_count=2, a third frame is ignored
    st, out3 = accumulate(st, a, 2)
    np.testing.assert_allclose(np.asarray(out3), 0.5)


def test_accumulate_reset_on_camera_move():
    st = AccumState.create(2, 2)
    st, _ = accumulate(st, jnp.ones((2, 2, 4)), 100)
    moved = camera_moved(jnp.eye(4), jnp.eye(4) * 1.01)
    st, out = accumulate(st, jnp.zeros((2, 2, 4)), 100, reset=moved)
    np.testing.assert_allclose(np.asarray(out), 0.0)  # history discarded
    assert int(st.count) == 1


def test_background_pixels_show_env(renderer):
    img = np.asarray(renderer.channels["BDPT"])
    pos = np.asarray(renderer.channels["WorldPosition"])
    bg = pos[..., 3] == 0
    # env map is black (zeros) by default -> background rgb ~ 0, alpha 1
    assert np.all(img[bg][:, 3] >= 0.99)
    assert np.all(img[bg][:, :3] <= 1e-5 + img[bg][:, :3].max())


def test_bdpt_energy_increases_with_depth(baked):
    cfg1 = RenderConfig(width=SIZE, height=SIZE)
    cfg1 = cfg1.with_(bdpt=cfg1.bdpt.__class__(max_depth=1))
    cfg3 = RenderConfig(width=SIZE, height=SIZE)
    r1 = Renderer(baked, cfg1)
    r3 = Renderer(baked, cfg3)
    m1 = float(np.asarray(r1.render(4))[..., :3].mean())
    m3 = float(np.asarray(r3.render(4))[..., :3].mean())
    assert m3 > m1  # more bounces add energy


def test_camera_move_resets_accum(baked):
    r = Renderer(baked, RenderConfig(width=SIZE, height=SIZE))
    r.render(4)
    assert int(r.state.accum.count) == 4
    r.set_camera_pose((0.5, 0.55, -1.3), (0.5, 0.5, 0.5))
    r.render_frame()
    assert int(r.state.accum.count) == 1  # reset on camera move


def _gbuffer_normals(built, size=32):
    from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer

    bk = Scene.from_built(built, aspect=1.0).bake()
    trace = make_shaded_tracer(bk)
    ch = gb.ray_traced_gbuffer(
        bk, trace, size, size, jnp.uint32(0), jnp.asarray([0.5, 0.5])
    )
    pos = np.asarray(ch["WorldPosition"])
    return np.asarray(ch["WorldNormal"])[..., :3], pos[..., 3] != 0, bk


def test_normal_mapping_flat_map_is_identity():
    # a constant (0.5, 0.5, 1.0) tangent-space map must leave normals exactly
    # where the unmapped path puts them (Shading.slang:135-157 semantics)
    plain = cornell_box()
    n_ref, valid, bk0 = _gbuffer_normals(plain)
    assert not bk0.has_normal_maps

    mapped = cornell_box()
    flat = np.zeros((8, 8, 4), np.float32)
    flat[..., 0:2] = 0.5
    flat[..., 2] = 1.0
    flat[..., 3] = 1.0
    mapped.materials[0].normal_map_image = flat
    n_flat, valid2, bk1 = _gbuffer_normals(mapped)
    assert bk1.has_normal_maps
    np.testing.assert_allclose(n_flat[valid], n_ref[valid], atol=1e-5)


def test_normal_mapping_perturbs_and_stays_unit():
    mapped = cornell_box()
    tilt = np.zeros((8, 8, 4), np.float32)
    tilt[..., 0] = 0.5 + 0.25   # lean toward +tangent
    tilt[..., 1] = 0.5
    tilt[..., 2] = 1.0
    tilt[..., 3] = 1.0
    mapped.materials[0].normal_map_image = tilt
    n_tilt, valid, _ = _gbuffer_normals(mapped)

    n_ref, _, _ = _gbuffer_normals(cornell_box())
    # unit everywhere valid
    np.testing.assert_allclose(
        np.linalg.norm(n_tilt[valid], axis=-1), 1.0, atol=1e-4
    )
    # material 0 covers most of the box: the tilt must actually move normals
    dev = np.abs(n_tilt[valid] - n_ref[valid]).max()
    assert dev > 0.1
