"""Camera controller tests (CameraController.cpp semantics, headless)."""
import jax.numpy as jnp
import numpy as np

from fyp_bidirectionalpathtracer_tpu.scene.camera import make_camera
from fyp_bidirectionalpathtracer_tpu.scene.controllers import (
    FirstPersonCameraController,
    KeyEvent,
    MouseEvent,
    OrbitCameraController,
    SixDoFCameraController,
)


def _cam():
    return make_camera(
        pos=(0.5, 0.5, -1.5), target=(0.5, 0.5, 0.5), up=(0, 1, 0),
        aspect=1.0,
    )


def test_orbit_initial_pose_and_zoom():
    c = OrbitCameraController(center=(0.5, 0.5, 0.5), radius=1.0,
                              distance_in_radii=3.0)
    cam, dirty = c.update(_cam())
    assert dirty
    pos = np.asarray(cam.pos_w)
    np.testing.assert_allclose(pos, [0.5, 0.5, 3.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.target), [0.5, 0.5, 0.5],
                               atol=1e-6)
    # wheel zooms in by 0.2 radii per tick (CameraController.cpp:61)
    assert c.on_mouse_event(MouseEvent("wheel", wheel=1.0))
    cam, _ = c.update(cam)
    np.testing.assert_allclose(np.asarray(cam.pos_w), [0.5, 0.5, 3.3],
                               atol=1e-5)


def test_orbit_drag_rotates_at_constant_distance():
    c = OrbitCameraController(center=(0.5, 0.5, 0.5), radius=1.0,
                              distance_in_radii=3.0)
    cam, _ = c.update(_cam())
    c.on_mouse_event(MouseEvent("left_down", pos=(0.5, 0.5)))
    c.on_mouse_event(MouseEvent("move", pos=(0.6, 0.5)))
    cam2, dirty = c.update(cam)
    assert dirty
    p1 = np.asarray(cam.pos_w) - 0.5
    p2 = np.asarray(cam2.pos_w) - 0.5
    assert np.linalg.norm(np.asarray(cam.pos_w) - np.asarray(cam2.pos_w)) > 1e-3
    np.testing.assert_allclose(np.linalg.norm(p1), np.linalg.norm(p2),
                               rtol=1e-5)  # stays on the orbit sphere


def test_first_person_wasd_moves_along_view():
    c = FirstPersonCameraController(speed=1.0)
    cam = _cam()
    assert c.on_key_event(KeyEvent("w", pressed=True))
    cam2, dirty = c.update(cam, dt=0.5)
    assert dirty
    moved = np.asarray(cam2.pos_w) - np.asarray(cam.pos_w)
    np.testing.assert_allclose(moved, [0, 0, 0.5], atol=1e-5)  # view = +z
    # shift = 10x speed modifier (CameraController.cpp:158-160)
    c.on_key_event(KeyEvent("w", pressed=True, shift=True))
    cam3, _ = c.update(cam2, dt=0.5)
    np.testing.assert_allclose(
        np.asarray(cam3.pos_w) - np.asarray(cam2.pos_w), [0, 0, 5.0],
        atol=1e-4,
    )


def test_first_person_look_keeps_up_y():
    c = FirstPersonCameraController()
    cam = _cam()
    c.on_mouse_event(MouseEvent("left_down", pos=(0.5, 0.5)))
    c.on_mouse_event(MouseEvent("move", pos=(0.55, 0.48)))
    cam2, dirty = c.update(cam, dt=0.016)
    assert dirty
    # view direction changed, position did not
    np.testing.assert_allclose(np.asarray(cam2.pos_w), np.asarray(cam.pos_w))
    v1 = np.asarray(cam.target) - np.asarray(cam.pos_w)
    v2 = np.asarray(cam2.target) - np.asarray(cam2.pos_w)
    assert np.linalg.norm(v1 / np.linalg.norm(v1) - v2 / np.linalg.norm(v2)) > 1e-4


def test_six_dof_roll():
    c = SixDoFCameraController()
    cam = _cam()
    c.on_mouse_event(MouseEvent("right_down", pos=(0.5, 0.5)))
    c.on_mouse_event(MouseEvent("move", pos=(0.6, 0.5)))
    cam2, dirty = c.update(cam, dt=0.016)
    assert dirty
    up2 = np.asarray(cam2.up)
    assert abs(up2[0]) > 1e-3  # rolled off +Y
    np.testing.assert_allclose(np.linalg.norm(up2), 1.0, atol=1e-5)
    # target unchanged by pure roll
    np.testing.assert_allclose(np.asarray(cam2.target),
                               np.asarray(cam.target), atol=1e-6)
