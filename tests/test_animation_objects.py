"""Object-path animation + skinning tests (Scene::update / SkinningCache
semantics)."""
import numpy as np
import jax.numpy as jnp

from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.ops.skinning import (
    bone_matrices,
    skin_vertices,
)
from fyp_bidirectionalpathtracer_tpu.scene.animation import (
    Keyframe,
    Path,
    rigid_transform_at,
)
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[c, 0, s], [0, 1, 0], [-c * 0 - s, 0, c]], np.float32)


def test_skinning_single_rigid_bone_is_exact():
    rng = np.random.RandomState(0)
    v = 64
    pos = jnp.asarray(rng.uniform(-1, 1, (v, 3)), jnp.float32)
    nrm_raw = rng.normal(size=(v, 3))
    nrm = jnp.asarray(
        nrm_raw / np.linalg.norm(nrm_raw, axis=-1, keepdims=True), jnp.float32
    )
    r = _rot_y(0.7)
    t = np.asarray([0.3, -0.2, 1.5], np.float32)
    palette = bone_matrices(jnp.asarray(r)[None], jnp.asarray(t)[None])
    ids = jnp.zeros((v, 4), jnp.int32)
    w = jnp.concatenate([jnp.ones((v, 1)), jnp.zeros((v, 3))], -1)
    p2, n2 = skin_vertices(pos, nrm, ids, w, palette)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pos) @ r.T + t,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(nrm) @ r.T,
                               atol=1e-5)


def test_skinning_blend_interpolates_translations():
    pos = jnp.zeros((4, 3), jnp.float32)
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (4, 1))
    eye = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    palette = bone_matrices(
        eye, jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    )
    ids = jnp.tile(jnp.asarray([[0, 1]], jnp.int32), (4, 1))
    w = jnp.asarray([[1.0, 0.0], [0.75, 0.25], [0.5, 0.5], [0.0, 1.0]])
    p2, _ = skin_vertices(pos, nrm, ids, w, palette)
    np.testing.assert_allclose(np.asarray(p2)[:, 0], [0.0, 0.5, 1.0, 2.0],
                               atol=1e-6)


def _two_frame_path(attached):
    return Path(
        name="p", loop=False, attached=attached,
        frames=[
            Keyframe(0.0, np.asarray([0.0, 0.0, 0.0], np.float32),
                     np.asarray([0.0, 0.0, -1.0], np.float32),
                     np.asarray([0.0, 1.0, 0.0], np.float32)),
            Keyframe(1.0, np.asarray([2.0, 0.0, 0.0], np.float32),
                     np.asarray([2.0, 0.0, -1.0], np.float32),
                     np.asarray([0.0, 1.0, 0.0], np.float32)),
        ],
    )


def test_rigid_transform_identity_orientation():
    path = _two_frame_path([("model_instance", "box")])
    r, t = rigid_transform_at(path, 0.5)
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)  # rest fwd = -z
    np.testing.assert_allclose(t, [1.0, 0.0, 0.0], atol=1e-6)


def test_scene_object_path_moves_mesh_and_rebakes():
    sc = Scene.from_built(cornell_box(), aspect=1.0)
    sc.meshes[0].name = "box"
    rest = sc.meshes[0].positions.copy()
    sc.object_paths.append(_two_frame_path([("model_instance", "box")]))

    assert sc.update_objects(0.5)
    np.testing.assert_allclose(
        sc.meshes[0].positions, rest + np.asarray([1.0, 0.0, 0.0]), atol=1e-5
    )
    # motion is from REST each time, not cumulative
    assert sc.update_objects(1.0)
    np.testing.assert_allclose(
        sc.meshes[0].positions, rest + np.asarray([2.0, 0.0, 0.0]), atol=1e-5
    )
    baked = sc.bake()
    assert baked.tris.v0.shape[0] > 0


def test_light_path_moves_light():
    sc = Scene.from_built(cornell_box(), aspect=1.0)
    sc.lights[0]["name"] = "keylight"
    sc.object_paths.append(_two_frame_path([("light", "keylight")]))
    assert sc.update_objects(1.0)
    np.testing.assert_allclose(sc.lights[0]["pos"], [2.0, 0.0, 0.0],
                               atol=1e-6)
