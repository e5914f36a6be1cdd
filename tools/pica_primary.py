"""Pica-4x primary-ray pallas test at moderate resolution."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
import bench as benchmod

size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rs = RenderSystem("wavefront", RenderConfig(max_path_length=0, variance_reduction=False))
benchmod.build_scene(rs)
rs.camera.resize(size, size); rs.camera.fov = 60.0
t0 = time.time(); rs.render_frame(samples=1)
print(f"compile+1st: {time.time()-t0:.1f}s", flush=True)
from rfw_tpu.render import RenderStatus
t0 = time.time(); rs.render_frame(status=RenderStatus.CONVERGE, samples=4)
dt = time.time()-t0
print(f"4 primary-only spp: {dt:.2f}s -> {4*size*size/dt/1e6:.1f} Mrays/s", flush=True)
