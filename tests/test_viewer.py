"""Live viewer (rfw_tpu/viewer.py): HTTP surface + camera input loop.

Drives the imgui_app-analog endpoints headlessly: frame stream, stats
panel, settings protocol, probe, and keyboard camera movement causing an
accumulation reset."""

import json
import threading
import urllib.request

import numpy as np

import rfw_tpu
from rfw_tpu.config import RenderConfig
from rfw_tpu.system import RenderSystem
from rfw_tpu.viewer import LiveViewer


def _rs():
    rs = RenderSystem("megakernel",
                      RenderConfig(blue_noise=False, max_path_length=1))
    floor = rs.add_material([0.6, 0.6, 0.65])
    rs.add_instance(rs.add_quad([0, 1, 0], [0, 0, 0], 10, 10, floor))
    lamp = rs.add_material([30.0, 30.0, 30.0])
    rs.add_instance(rs.add_quad([0, -1, 0], [0, 6.0, 0], 2, 2, lamp))
    rs.camera.look_at([0, 2.5, -5.0], [0, 1.0, 0.0])
    return rs


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.read()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


def test_viewer_endpoints_and_camera():
    rs = _rs()
    viewer = LiveViewer(rs, 64, 48, port=0, samples_per_frame=1)
    pos0 = rs.camera.position.copy()

    t = threading.Thread(target=viewer.run, kwargs={"max_frames": 40})
    t.start()
    try:
        # wait for the first frame (first render includes jit compile)
        import time
        for _ in range(120):
            png = _get(viewer.port, "/frame.png")
            if png.startswith(b"\x89PNG"):
                break
            time.sleep(0.5)
        assert png.startswith(b"\x89PNG")

        page = _get(viewer.port, "/").decode()
        assert "rfw_tpu" in page and "canvas" in page

        stats = json.loads(_get(viewer.port, "/stats"))
        assert any(s["name"] == "intersector" for s in stats["settings"])

        _post(viewer.port, "/input",
              {"action": "probe", "x": 32, "y": 24})
        _post(viewer.port, "/input", {"action": "keys", "keys": ["w"]})
        _post(viewer.port, "/input",
              {"action": "set", "name": "denoise", "value": "0"})
        # material editor: color+roughness edit lands in the system of
        # record and dirties MATERIALS (imgui material panel analog)
        stats = json.loads(_get(viewer.port, "/stats"))
        assert len(stats["materials"]) == 2
        assert stats["materials"][0]["color"][0] == 0.6015625 or \
            abs(stats["materials"][0]["color"][0] - 0.6) < 1e-5
        _post(viewer.port, "/input",
              {"action": "material", "index": 0,
               "color": [0.9, 0.1, 0.1], "roughness": 0.25})

        # wait until stats reflect rendering progress
        for _ in range(100):
            stats = json.loads(_get(viewer.port, "/stats"))
            if stats["stats"].get("rays primary", 0) > 0 and \
                    not np.allclose(rs.camera.position, pos0):
                break
            time.sleep(0.25)
        assert stats["stats"]["rays primary"] == 64 * 48
        assert not np.allclose(rs.camera.position, pos0), \
            "keyboard input did not move the camera"
        assert stats["probe"] is not None
        m0 = rs.get_material(0)
        assert abs(float(m0.roughness) - 0.25) < 1e-6
        assert abs(float(np.asarray(m0.color)[0]) - 0.9) < 1e-6
    finally:
        viewer.stop()
        t.join(timeout=60)
        assert not t.is_alive()
