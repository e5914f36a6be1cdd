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


def test_render_state_checkpoint(tmp_path):
    """Progressive accumulator persists across RenderSystem instances:
    8 continuous samples == 4 samples + save + load + 4 CONVERGE samples
    (deterministic sampler ⇒ identical accumulators)."""
    import numpy as np

    from rfw_tpu.config import RenderConfig
    from rfw_tpu.render import RenderStatus
    from rfw_tpu.system import RenderSystem

    def build():
        rs = RenderSystem("megakernel",
                          RenderConfig(blue_noise=False, max_path_length=1))
        m = rs.add_material([0.6, 0.6, 0.6])
        rs.add_instance(rs.add_quad([0, 1, 0], [0, 0, 0], 8, 8, m))
        rs.add_point_light([0, 3.0, 0], [20.0] * 3)
        rs.camera.resize(32, 24)
        rs.camera.look_at([0, 2.0, -3.0], [0, 0, 0])
        return rs

    rs_a = build()
    ref = rs_a.render_frame(samples=8)

    rs_b = build()
    rs_b.render_frame(samples=4)
    p = str(tmp_path / "render_state.npz")
    assert rs_b.save_render_state(p)

    rs_c = build()
    assert rs_c.load_render_state(p)
    out = rs_c.render_frame(status=RenderStatus.CONVERGE, samples=4)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_fxaa_smooths_edges():
    import jax.numpy as jnp
    import numpy as np

    from rfw_tpu.ops.tonemap import fxaa

    y, x = np.indices((32, 32))
    img = np.repeat(((x > y)).astype(np.float32)[..., None], 3, axis=-1)
    out = np.asarray(fxaa(jnp.asarray(img)))   # diagonal staircase
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    # pixels on the staircase blend toward gray; far flats stay put
    diag = np.array([out[i, i + 1, 0] for i in range(4, 28)])
    assert ((diag > 0.02) & (diag < 0.98)).any(), diag
    assert abs(out[20, 4, 0]) < 1e-6 and abs(out[4, 20, 0] - 1.0) < 1e-6
