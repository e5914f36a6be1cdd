"""Attribute the 1080p setup+compile wall time: trace/lower vs backend
compile for each jitted piece the bench warmup builds (one-jit step,
profiled-step stages, compaction, finalize), using the AOT API.

Usage: python tools/compile_probe.py [--skip-profiled]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
import bench as benchmod  # noqa: E402

W, H = 1920, 1080
t0 = time.time()
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(W, H)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(W, H)
eng.update()
print(f"scene ready {time.time()-t0:.1f}s", flush=True)
eng._get_trace_fn(W, H)
drv = eng._driver
assert drv is not None, "driver not engaged"
scene = eng._scene
view = rs.camera.get_view().as_pytree()
acc = jnp.zeros((W * H, 3), jnp.float32)

t0 = time.time()
lowered = drv._sample_fn.lower(scene, acc, drv._pid_dev, drv._inv_dev,
                               view, jnp.uint32(0), jnp.int32(0))
t_lower = time.time() - t0
print(f"one-jit trace+lower {t_lower:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
t_comp = time.time() - t0
print(f"one-jit backend compile {t_comp:.1f}s", flush=True)

t0 = time.time()
out = compiled(scene, acc, drv._pid_dev, drv._inv_dev, view,
               jnp.uint32(0), jnp.int32(0))
np.asarray(out[0].ravel()[:1])
print(f"one-jit first run {time.time()-t0:.1f}s", flush=True)

if "--skip-profiled" not in sys.argv:
    t0 = time.time()
    acc2 = jnp.zeros((W * H, 3), jnp.float32)
    drv.step_profiled(scene, acc2, view, jnp.uint32(1), jnp.int32(0))
    print(f"profiled step compile+run {time.time()-t0:.1f}s", flush=True)
