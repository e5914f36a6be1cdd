"""Per-depth + per-stage cost split of the compacted wavefront driver at
1080p (pica-4x). Depth times come free from the driver's live-count syncs;
stage attribution inside a depth comes from config-variant deltas."""
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
    ("full (default)", dict()),
    ("no NEE (VR off)", dict(variance_reduction=False)),
    ("no env NEE", dict(envmap_nee=False)),
    ("nearest textures", dict(texture_filter="nearest")),
    ("no compaction (fused)", dict(compaction=False)),
]

eng = rs.context
for name, kw in variants:
    eng.config = dataclasses.replace(RenderConfig(), **kw)
    eng._trace_fn = None
    t0 = time.time()
    rs.render_frame(samples=1)                      # compile + warm
    compile_s = time.time() - t0
    t0 = time.time()
    rs.render_frame(status=RenderStatus.CONVERGE, samples=3)
    dt = (time.time() - t0) / 3
    drv = getattr(eng, "_driver", None)
    depth_str = ""
    if drv is not None and drv.depth_times:
        depth_str = " depths[ms]: " + " ".join(
            f"{1000 * x:.0f}" for x in drv.depth_times)
    print(f"{name}: {dt * 1000:.0f} ms/sample (compile {compile_s:.0f}s)"
          f"{depth_str}", flush=True)
