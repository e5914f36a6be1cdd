"""A/B/C the wavefront engine's intersector at the bench workload (1080p
pica-4x): visit vs tvisit (the flagship vs the round-5 candidate;
pass intersector names as args). One scene build, shared engine."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render import RenderStatus  # noqa: E402
import bench as benchmod  # noqa: E402

cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080)
rs.camera.fov = 60.0

for name in (sys.argv[1:] or ["visit", "tvisit"]):
    rs.context.set_setting("intersector", name)
    t0 = time.time()
    rs.render_frame(samples=1)     # compile + warmup
    print(f"{name}: warmup+compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    rs.render_frame(status=RenderStatus.CONVERGE, samples=2)
    dt = (time.time() - t0) / 2
    st = rs.get_render_stats()
    rays = (st.primary_count + st.secondary_count + st.deep_count
            + st.shadow_count)
    print(f"{name}: {dt*1000:.0f} ms/sample  "
          f"{rays/dt/1e6:.2f} Mrays/s", flush=True)
