"""Combined material texel table (TextureAtlas.combined) equivalence:
one u8-packed gather must match the per-kind f32 taps within u8
quantization, including constant fallbacks and wrap addressing.
"""
import jax.numpy as jnp
import numpy as np

from fyp_bidirectionalpathtracer_tpu.models.procedural import textured_room
from fyp_bidirectionalpathtracer_tpu.ops.texture import (
    sample_base_color,
    sample_combined,
    sample_or_constant,
)
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene


def _baked():
    """textured_room with spec + emissive images added so the bake builds
    the combined table (it requires >=2 textured kinds)."""
    built = textured_room()
    rs = np.random.RandomState(11)
    built.materials[0].specular_image = rs.uniform(
        0, 1, (64, 64, 4)).astype(np.float32)
    built.materials[-1].emissive_image = rs.uniform(
        0, 1, (32, 32, 4)).astype(np.float32)
    return Scene.from_built(built).bake()


def test_combined_matches_per_kind_taps():
    baked = _baked()
    atlas = baked.data.textures
    mats = baked.data.materials
    assert atlas.combined is not None
    m_count = int(mats.base_color.shape[0])

    rs = np.random.RandomState(3)
    uv = jnp.asarray(rs.uniform(-1.5, 2.5, (4096, 2)).astype(np.float32))
    mat = jnp.asarray(rs.randint(0, m_count, 4096).astype(np.int32))

    base_c, spec_c, em_c = sample_combined(atlas, mat, uv)

    base_ref = sample_or_constant(
        atlas, mats.base_color_tex[mat], uv,
        jnp.zeros((4096, 4)), static_used=True)
    spec_ref = sample_or_constant(
        atlas, mats.specular_tex[mat], uv,
        jnp.zeros((4096, 4)), static_used=True)

    # where the material HAS the texture kind, combined == per-kind tap
    # within u8 quantization of the four corners (<= 1/255 after lerp)
    has_base = np.asarray(mats.base_color_tex)[np.asarray(mat)] >= 0
    np.testing.assert_allclose(
        np.asarray(base_c)[has_base], np.asarray(base_ref)[has_base],
        atol=1.5 / 255.0)
    has_spec = np.asarray(mats.specular_tex)[np.asarray(mat)] >= 0
    if has_spec.any():
        np.testing.assert_allclose(
            np.asarray(spec_c)[has_spec], np.asarray(spec_ref)[has_spec],
            atol=1.5 / 255.0)


def test_sample_base_color_constant_fallback():
    baked = _baked()
    atlas = baked.data.textures
    mats = baked.data.materials
    tex_flags = np.asarray(mats.base_color_tex)
    untex = np.nonzero(tex_flags < 0)[0]
    if len(untex) == 0:
        return
    uv = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (64, 2))
                     .astype(np.float32))
    mat = jnp.full((64,), int(untex[0]), jnp.int32)
    got = sample_base_color(atlas, mats, mat, uv)
    # constants bypass the u8 table entirely -> exact
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(mats.base_color[mat]))


def test_shading_uses_combined_path():
    """prepare_shading_data through the combined table stays consistent
    with a bake that disables it (forcing per-kind taps)."""
    from fyp_bidirectionalpathtracer_tpu.accel.traverse import intersect_brute
    from fyp_bidirectionalpathtracer_tpu.ops.shading import (
        prepare_shading_data,
    )

    baked = _baked()
    atlas = baked.data.textures
    rs = np.random.RandomState(7)
    o = jnp.asarray(rs.uniform(-0.5, 0.5, (512, 3)).astype(np.float32))
    d = rs.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    hit = intersect_brute(baked.tris, o, d, 1e-3)

    sd_comb = prepare_shading_data(
        baked.tris, baked.data.materials, atlas, hit, o, d, o)
    atlas_plain = atlas.replace(
        combined=None,
        packed=atlas.packed if atlas.packed is not None else None,
    )
    sd_plain = prepare_shading_data(
        baked.tris, baked.data.materials, atlas_plain, hit, o, d, o)
    np.testing.assert_allclose(np.asarray(sd_comb.diffuse),
                               np.asarray(sd_plain.diffuse), atol=2.0 / 255)
    np.testing.assert_allclose(np.asarray(sd_comb.specular),
                               np.asarray(sd_plain.specular), atol=2.0 / 255)
    np.testing.assert_allclose(np.asarray(sd_comb.emissive),
                               np.asarray(sd_plain.emissive), atol=2.0 / 255)
    # geometry-only fields bit-identical
    np.testing.assert_array_equal(np.asarray(sd_comb.n),
                                  np.asarray(sd_plain.n))
