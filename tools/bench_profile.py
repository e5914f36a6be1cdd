"""Stage costs in the REAL engine at the bench workload via config ablation.
Differences between variants isolate per-stage cost with device-resident
scenes and one jit per chunk (no tool-level numpy-arg upload artifacts)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.render import RenderStatus
import bench as benchmod
import dataclasses

W, H = map(int, os.environ.get("RFW_PROFILE_SIZE", "1920x1080").split("x"))
variants = {
    "mpl0 noNEE (primary+shade)": RenderConfig(
        max_path_length=0, variance_reduction=False, envmap_nee=False),
    "mpl0 NEE (+1 fused anyhit)": RenderConfig(max_path_length=0),
    "mpl1 noNEE (+1 bounce closest)": RenderConfig(
        max_path_length=1, variance_reduction=False, envmap_nee=False),
    "mpl2 noNEE (+2 bounce closest)": RenderConfig(
        max_path_length=2, variance_reduction=False, envmap_nee=False),
    "full mpl2+NEE+env": RenderConfig(max_path_length=2),
}
for name, cfg in variants.items():
    rs = RenderSystem("wavefront", cfg)
    benchmod.build_scene(rs)
    rs.camera.resize(W, H); rs.camera.fov = 60.0
    t0 = time.time()
    rs.render_frame(samples=1)
    tc = time.time() - t0
    t0 = time.time()
    rs.render_frame(status=RenderStatus.CONVERGE, samples=2)
    dt = (time.time() - t0) / 2
    print(f"{name}: {dt*1000:.0f} ms/sample (compile {tc:.0f}s)", flush=True)
