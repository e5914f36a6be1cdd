"""Stage-cost breakdown at 512^2 on pica-4x: times four integrator configs."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.render import RenderStatus
import bench as benchmod
import dataclasses

size = 384
variants = {
    "primary only (mpl0, no NEE)": RenderConfig(max_path_length=0, variance_reduction=False),
    "primary + NEE (mpl0)": RenderConfig(max_path_length=0),
    "2 bounces, no NEE": RenderConfig(max_path_length=2, variance_reduction=False),
    "full (mpl2 + NEE + env)": RenderConfig(max_path_length=2),
}
for name, cfg in variants.items():
    rs = RenderSystem("wavefront", cfg)
    benchmod.build_scene(rs)
    rs.camera.resize(size, size); rs.camera.fov = 60.0
    rs.render_frame(samples=1)
    t0 = time.time()
    rs.render_frame(status=RenderStatus.CONVERGE, samples=4)
    dt = (time.time() - t0) / 4
    print(f"{name}: {dt*1000:.0f} ms/sample", flush=True)
