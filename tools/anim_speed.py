"""Animation end-to-end rate (VERDICT r1 next #2): CesiumMan skinning +
device refit + render per frame on the flagship engine. Target ≥5 fps."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

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

t0 = time.time()
rs.render_frame(status=RenderStatus.RESET, samples=1)
print(f"first frame (compile): {time.time() - t0:.1f}s", flush=True)

eng = rs.context
# warm the refit path (its jit compiles once)
rs.set_animations_to(0.05)
t0 = time.time()
rs.render_frame(status=RenderStatus.RESET, samples=1)
print(f"first anim frame (refit compile): {time.time() - t0:.1f}s",
      flush=True)

n_frames = 20
t_anim = t_render = 0.0
t_all = time.time()
for i in range(n_frames):
    t0 = time.time()
    rs.set_animations_to(0.1 + 0.04 * i)
    t1 = time.time()
    frame = rs.render_frame(status=RenderStatus.RESET, samples=1)
    t2 = time.time()
    t_anim += t1 - t0
    t_render += t2 - t1
wall = time.time() - t_all
assert np.isfinite(frame).all()
print(f"{n_frames} frames @{size}x{size}: {wall:.2f}s -> "
      f"{n_frames / wall:.2f} fps (anim {t_anim / n_frames * 1e3:.0f} ms, "
      f"sync+refit+render {t_render / n_frames * 1e3:.0f} ms)", flush=True)
print(f"device refit engaged: "
      f"{getattr(eng, '_device_refit', None) is not None}", flush=True)
