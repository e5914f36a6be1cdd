"""Per-depth cost split of the real engine at 1080p (pica-4x), one scene
build: vary max_path_length / variance_reduction, recompile only the trace
fn. Deltas isolate each depth's closest+NEE cost in the true pipeline."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render import RenderStatus  # noqa: E402
import bench as benchmod  # noqa: E402

rs = RenderSystem("wavefront", RenderConfig())
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080)
rs.camera.fov = 60.0

variants = [
    ("primary only", dict(max_path_length=0, variance_reduction=False)),
    ("primary+NEE", dict(max_path_length=0)),
    ("1 bounce full", dict(max_path_length=1)),
    ("2 bounces full", dict(max_path_length=2)),
]

eng = rs.context
for name, kw in variants:
    eng.config = dataclasses.replace(RenderConfig(), **kw)
    eng._trace_fn = None
    if name.endswith("no tex"):
        sc = dict(eng._scene)
        sc.pop("matlas", None)
        sc.pop("matlas_desc", None)
        sc["atlas"] = None
        sc["atlas_desc"] = None
        eng._scene = sc
        eng._atlas = None
    t0 = time.time()
    rs.render_frame(samples=1)
    compile_s = time.time() - t0
    t0 = time.time()
    rs.render_frame(status=RenderStatus.CONVERGE, samples=2)
    dt = (time.time() - t0) / 2
    print(f"{name}: {dt*1000:.0f} ms/sample (compile {compile_s:.0f}s)",
          flush=True)
