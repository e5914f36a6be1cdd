"""Flagship instance-move latency (VERDICT r3 #6): time a transforms-only
instance move through RenderSystem.synchronize() on the wavefront/visit
path — the route an interactive app pays per moved instance
(reference set_instance + TLAS refit, system.cpp:599-620 /
top_level_bvh.cpp:17-53; the flagship flattens instances, so its analog
is the jitted device refit in scene_data.make_device_refit).

Builds the bench scene (pica 2x2, ~305k tris) on the wavefront engine,
compiles one 1-spp frame, then times N successive update_instance +
synchronize calls with a forced device readback. Target: < 100 ms.

Usage: python tools/instance_move_ab.py [--cpu] [--small]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.system import RenderSystem  # noqa: E402
import bench  # noqa: E402


def main():
    config = RenderConfig()
    rs = RenderSystem("wavefront", config)
    if "--small" in sys.argv:
        m = rs.add_material([0.7, 0.7, 0.7])
        g = rs.add_quad([0, 1, 0], [0, 0, 0], 20, 20, m)
        rs.add_instance(g)
        lamp = rs.add_material([40.0, 40.0, 40.0])
        gl = rs.add_quad([0, -1, 0], np.array([0, 18.0, 0]), 6, 6, lamp)
        rs.add_instance(gl)
        rs.camera.look_at(np.array([0, 8.0, -12.0]), np.zeros(3))
        rs.camera.resize(256, 256)
    else:
        bench.build_scene(rs)
        rs.camera.resize(960, 540)
    t0 = time.time()
    rs.synchronize()
    print(f"initial synchronize {time.time() - t0:.2f}s", flush=True)
    if "--render" in sys.argv:
        t0 = time.time()
        rs.render_frame(samples=1)
        print(f"first frame (compile) {time.time() - t0:.1f}s", flush=True)

    eng = rs.context
    scene_leaf = lambda: np.asarray(  # noqa: E731
        eng._scene["tri_vertices"].ravel()[:1])

    if "--prewarm" in sys.argv:
        t0 = time.time()
        eng.prewarm_instance_moves()
        print(f"prewarm_instance_moves {time.time() - t0:.1f}s", flush=True)

    base = np.eye(4, dtype=np.float32)
    for it in range(4):
        m = base.copy()
        m[0, 3] = 0.01 * (it + 1)          # nudge instance 0
        rs.update_instance(0, m)
        t0 = time.time()
        rs.synchronize()
        scene_leaf()                        # force refresh completion
        dt = (time.time() - t0) * 1000
        print(f"move {it}: synchronize+sync {dt:8.1f} ms", flush=True)

    if "--render" in sys.argv:
        # and the re-render cost after a move (accumulation restarts)
        m = base.copy()
        m[0, 3] = 0.05
        rs.update_instance(0, m)
        t0 = time.time()
        rs.synchronize()
        rs.render_frame(samples=1)
        print(f"move + 1-spp frame: {(time.time() - t0) * 1000:.0f} ms",
              flush=True)


if __name__ == "__main__":
    main()
