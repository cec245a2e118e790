import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.scene import camera as cam_mod
from fyp_bidirectionalpathtracer_tpu.scene import lights as light_mod
from fyp_bidirectionalpathtracer_tpu.scene.animation import path_from_dict
from fyp_bidirectionalpathtracer_tpu.scene.fscene import load_fscene
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.scene.types import LIGHT_DIRECTIONAL, LIGHT_POINT
from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box


def test_camera_basis_orthogonal():
    cam = cam_mod.make_camera(pos=(0, 0, -2), target=(0, 0, 0), aspect=1.0)
    u, v, w = np.asarray(cam.camera_u), np.asarray(cam.camera_v), np.asarray(cam.camera_w)
    assert abs(np.dot(u, v)) < 1e-4
    assert abs(np.dot(u, w)) < 1e-4
    assert abs(np.dot(v, w)) < 1e-4
    # fovY for 21mm focal / 24mm frame: tan = 24/2/21
    assert np.linalg.norm(v) / np.linalg.norm(w) == pytest.approx(12.0 / 21.0, rel=1e-5)


def test_camera_ray_dirs_center_pixel():
    cam = cam_mod.make_camera(pos=(0, 0, -2), target=(0, 0, 5), aspect=1.0)
    d = cam_mod.camera_ray_dirs(cam, 64, 64, jnp.asarray([0.5, 0.5]))
    center = np.array(d[32, 32])
    center = center / np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 0, 1], atol=0.03)


def test_project_dir_roundtrip():
    cam = cam_mod.make_camera(pos=(0, 0, -2), target=(0, 0, 5), aspect=1.0)
    jitter = jnp.asarray([0.5, 0.5])
    dirs = cam_mod.camera_ray_dirs(cam, 32, 32, jitter)
    ix, iy = cam_mod.project_dir_to_pixel(cam, dirs, (32, 32), jitter)
    gx, gy = np.meshgrid(np.arange(32), np.arange(32))
    np.testing.assert_array_equal(np.asarray(ix), gx)
    np.testing.assert_array_equal(np.asarray(iy), gy)


def test_begin_frame_rolls_prev_view_proj():
    cam = cam_mod.make_camera(pos=(0, 0, -2), target=(0, 0, 0), aspect=1.0)
    vp0 = np.asarray(cam.view_proj)
    cam2 = cam.replace(pos_w=jnp.asarray([0.0, 0.5, -2.0]))
    cam2 = cam_mod.begin_frame(cam2)
    # prev must equal the matrix derived from the *new* pose pre-roll?  No:
    # begin_frame computes prev from the camera state it is given.
    assert not np.allclose(np.asarray(cam2.view_proj), vp0)
    np.testing.assert_allclose(
        np.asarray(cam2.prev_view_proj), np.asarray(cam2.view_proj), atol=1e-5
    )


def test_point_light_inverse_square():
    la = light_mod.make_light_array(
        [{"type": "point", "pos": (0, 2, 0), "intensity": (10, 10, 10)}]
    )
    p = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    to_l, inten, dist, _ = light_mod.eval_light(la, jnp.asarray([0, 0]), p)
    np.testing.assert_allclose(np.asarray(to_l), [[0, 1, 0], [0, 1, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist), [2.0, 1.0], rtol=1e-6)
    ratio = float(inten[1, 0] / inten[0, 0])
    assert ratio == pytest.approx(4.0, rel=1e-3)


def test_directional_light_constant():
    la = light_mod.make_light_array(
        [{"type": "dir", "dir": (0, -1, 0), "intensity": (2, 2, 2)}]
    )
    p = jnp.asarray([[0.0, 0.0, 0.0], [5.0, -3.0, 1.0]])
    to_l, inten, dist, lpos = light_mod.eval_light(la, jnp.asarray([0, 0]), p)
    np.testing.assert_allclose(np.asarray(to_l), [[0, 1, 0], [0, 1, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(inten), 2.0 * np.ones((2, 3)), rtol=1e-6)
    assert int(la.type[0]) == LIGHT_DIRECTIONAL


def test_bake_cornell_counts():
    baked = Scene.from_built(cornell_box()).bake()
    assert baked.data.geometry.indices.shape[0] == baked.tris.v0.shape[0]
    assert int(baked.data.lights.count) == 1
    assert int(baked.data.lights.type[0]) == LIGHT_POINT
    assert baked.data.materials.base_color.shape[0] == 3


def test_animation_path_interpolation():
    p = path_from_dict(
        {
            "name": "p",
            "loop": True,
            "frames": [
                {"time": 0.0, "pos": [0, 0, 0], "target": [1, 0, 0], "up": [0, 1, 0]},
                {"time": 2.0, "pos": [2, 0, 0], "target": [3, 0, 0], "up": [0, 1, 0]},
            ],
        }
    )
    pos, tgt, up = p.sample(1.0)
    np.testing.assert_allclose(pos, [1, 0, 0], atol=1e-6)
    pos, _, _ = p.sample(3.0)  # loops: 3 % 2 = 1
    np.testing.assert_allclose(pos, [1, 0, 0], atol=1e-6)


def test_fscene_loader(tmp_path):
    doc = {
        "version": 2,
        "camera_speed": 1.0,
        "lighting_scale": 2.0,
        "active_camera": "Cam",
        "models": [],
        "lights": [
            {"type": "point_light", "pos": [1, 2, 3], "intensity": [1, 1, 1],
             "direction": [0, -1, 0], "opening_angle": 180.0},
            {"type": "dir_light", "direction": [0.3, -0.5, 0.8], "intensity": [1, 1, 0.9]},
        ],
        "cameras": [
            {"name": "Cam", "pos": [0, 1, -3], "target": [0, 1, 0], "up": [0, 1, 0],
             "focal_length": 21.0, "depth_range": [0.1, 10000.0], "aspect_ratio": 1.0}
        ],
        "paths": [
            {"name": "P", "loop": True, "frames": [
                {"time": 0.0, "pos": [0, 0, 0], "target": [0, 0, 1], "up": [0, 1, 0]}]}
        ],
    }
    f = tmp_path / "test.fscene"
    f.write_text(json.dumps(doc))
    scene = load_fscene(str(f))
    assert len(scene.lights) == 2
    assert scene.lights[0]["opening_angle"] == pytest.approx(np.pi)
    assert scene.camera is not None
    assert len(scene.camera_paths) == 1
    baked = scene.bake()
    # lighting scale applied
    assert float(baked.data.lights.intensity[0, 0]) == pytest.approx(2.0)


def test_pink_room_fscene_parses_with_standin():
    ref = "/root/reference/src/CommonPasses/Data/pink_room/pink_room.fscene"
    if not os.path.exists(ref):
        pytest.skip("reference scene not available")
    scene = load_fscene(ref, allow_missing_models=True)
    assert len(scene.lights) == 3  # 1 dir + 2 point
    assert scene.camera is not None
    assert len(scene.camera_paths) == 1
    assert scene.n_triangles() > 0  # stand-in geometry substituted for FBX


def test_fscene_save_load_roundtrip(tmp_path):
    """save_fscene (SceneExporter analogue) -> load_fscene preserves
    geometry, materials, lights, camera, and paths."""
    import numpy as np

    from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
    from fyp_bidirectionalpathtracer_tpu.scene import animation
    from fyp_bidirectionalpathtracer_tpu.scene.fscene import (
        load_fscene,
        save_fscene,
    )
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene

    src = Scene.from_built(cornell_box())
    src.apply_default_fixups()
    src.camera_paths.append(animation.Path(
        name="orbit", loop=True,
        frames=[
            animation.Keyframe(0.0, np.zeros(3), np.ones(3), np.asarray([0., 1., 0.])),
            animation.Keyframe(2.0, np.ones(3), np.zeros(3), np.asarray([0., 1., 0.])),
        ],
    ))
    path = str(tmp_path / "export" / "scene.fscene")
    save_fscene(src, path)

    dst = load_fscene(path, allow_missing_models=False)
    assert sum(len(m.indices) for m in dst.meshes) == src.n_triangles()
    assert len(dst.lights) == len(src.lights)
    np.testing.assert_allclose(
        np.asarray(dst.camera.pos_w), np.asarray(src.camera.pos_w), atol=1e-4
    )
    assert len(dst.camera_paths) == 1
    assert dst.camera_paths[0].frames[1].time == 2.0
    # material colors survive the MTL round trip
    kinds = {tuple(np.round(m.base_color[:3], 3)) for m in dst.materials}
    assert (0.0, 1.0, 0.0) in kinds or any(
        abs(c[1] - max(c)) < 1e-3 and c[1] > 0.4 for c in kinds
    )
