"""Attribute the interactive animation frame (VERDICT r1 #2): where do
the ~240 ms/frame at 256x256 go? Phases per frame: animation eval,
synchronize+refit, device render dispatch, frame readback, stats.

Usage: python tools/anim_attr.py [size]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render import RenderStatus  # noqa: E402

size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
rs = RenderSystem("wavefront", RenderConfig())
ref = rs.add_object("/root/reference/assets/models/CesiumMan/CesiumMan.gltf")
rs.add_instance(ref)
floor = rs.add_material([0.5, 0.5, 0.55])
rs.add_instance(rs.add_quad([0, 1, 0], [0, 0, 0], 10, 10, floor))
rs.add_directional_light([0.4, -1.0, 0.3], [2.5, 2.4, 2.2])
from rfw_tpu.scene import Skybox  # noqa: E402
rs.set_skybox(Skybox.test_sky(128, 64))
v = np.concatenate([m.triangles().vertices.reshape(-1, 3)
                    for m in ref.object.meshes])
c = v.mean(0)
rs.camera.resize(size, size)
rs.camera.look_at(c + np.array([1.2, 0.6, 2.4]), c)

rs.render_frame(status=RenderStatus.RESET, samples=1)
rs.set_animations_to(0.05)
rs.render_frame(status=RenderStatus.RESET, samples=1)

eng = rs.context
view = rs.camera.get_view()

ph = {k: 0.0 for k in ("anim", "sync+refit", "dispatch+wait", "frame_np",
                       "stats")}
N = 20
t_all = time.time()
for i in range(N):
    t0 = time.time()
    rs.set_animations_to(0.1 + 0.04 * i)
    t1 = time.time()
    rs.synchronize()
    eng.update()
    t2 = time.time()
    # mirror engine.render_frame internals with phase timing
    frame = eng.render_frame(view, RenderStatus.RESET, samples=1)
    t3 = time.time()
    arr = np.asarray(frame)
    t4 = time.time()
    st = eng.get_stats()
    t5 = time.time()
    ph["anim"] += t1 - t0
    ph["sync+refit"] += t2 - t1
    ph["dispatch+wait"] += t3 - t2
    ph["frame_np"] += t4 - t3
    ph["stats"] += t5 - t4
wall = time.time() - t_all
print(f"{N} frames @{size}: {N / wall:.2f} fps ({wall / N * 1e3:.0f} "
      f"ms/frame)", flush=True)
for k, val in ph.items():
    print(f"  {k:14s}: {val / N * 1e3:6.1f} ms", flush=True)
