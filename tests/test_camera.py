"""Camera math tests (reference Camera.cpp:74-115 semantics)."""

import math

import numpy as np

from rfw_tpu.camera import Camera


def test_basis_orthonormal():
    cam = Camera()
    cam.look_at([1, 2, 3], [4, 5, 6])
    r, u, f = cam.calculate_matrix()
    for v in (r, u, f):
        assert abs(np.linalg.norm(v) - 1) < 1e-5
    assert abs(np.dot(r, u)) < 1e-5
    assert abs(np.dot(r, f)) < 1e-5
    assert abs(np.dot(u, f)) < 1e-5
    # right = cross(forward, world_up) orientation
    assert np.allclose(np.cross(f, np.array([0, 1, 0.0])) /
                       np.linalg.norm(np.cross(f, [0, 1, 0.0])), r, atol=1e-5)


def test_view_geometry():
    cam = Camera()
    cam.resize(640, 480)
    cam.look_at([0, 0, 0], [0, 0, 1])
    cam.fov = 60.0
    cam.focal_distance = 2.0
    view = cam.get_view()
    # image-plane center must sit focal_distance along the view direction
    center = (view.p1 + view.p2 + view.p3 +
              (view.p2 + view.p3 - view.p1)) / 4.0
    assert np.allclose(center, [0, 0, 2.0], atol=1e-5)
    # vertical extent: 2 * tan(fov/2) * focal
    h = np.linalg.norm(view.p3 - view.p1)
    assert abs(h - 2 * math.tan(math.radians(30)) * 2.0) < 1e-5
    # aspect ratio
    w = np.linalg.norm(view.p2 - view.p1)
    assert abs(w / h - 640 / 480) < 1e-5
    # spread angle = fov_rad / pixels_y (Camera.cpp:80)
    assert abs(view.spread_angle - math.radians(60) / 480) < 1e-9


def test_serialize_roundtrip(tmp_path):
    cam = Camera()
    cam.look_at([1, 2, 3], [0, 0, 0])
    cam.fov = 75.0
    cam.aperture = 0.01
    cam.resize(800, 600)
    p = str(tmp_path / "camera.bin")
    cam.serialize(p)
    cam2 = Camera.deserialize(p)
    assert np.allclose(cam.position, cam2.position)
    assert np.allclose(cam.direction, cam2.direction)
    assert cam2.fov == 75.0
    assert cam2.pixel_count == (800, 600)


def test_deserialize_missing_falls_back(tmp_path):
    cam = Camera.deserialize(str(tmp_path / "nope.bin"))
    assert cam.fov == 40.0  # defaults (reference Camera.cpp:54-61)
