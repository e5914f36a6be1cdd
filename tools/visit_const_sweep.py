"""Sweep the visit kernel's module constants (PIPE depth, EXIT_EVERY
reduction period) on the captured 1080p d1 bounce stream. These were set
by reasoning in round 2 and never swept on chip.

Usage: python tools/visit_const_sweep.py [PIPE ...]x[EXIT ...]
       (edit the lists below; each combo re-jits the kernel)
"""
import importlib
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
import bench as benchmod  # noqa: E402

npz = np.load("/tmp/d1_stream.npz")
o = jnp.asarray(npz["origin"])
d = jnp.asarray(npz["direction"])
tm = jnp.asarray(npz["tmax"])
print(f"stream {o.shape[0]} rays", flush=True)

cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.synchronize()
eng = rs.context
eng.resize(64, 64)
eng.update()
scene = eng._scene

COMBOS = [(8, 4), (4, 4), (16, 4), (8, 2), (8, 8), (8, 1)]

ref_hits = None
base = None
for pipe, ee in COMBOS:
    import rfw_tpu.ops.visit_intersect as vi
    vi.PIPE = pipe
    vi.EXIT_EVERY = ee
    # new jit instances so the kernel re-traces with the new constants
    vi._run_visit_kernel.clear_cache()
    out = vi.closest_hit(scene, o, d, cfg, t_max=tm, sort=False)
    jax.block_until_ready(out)
    np.asarray(out[0].ravel()[:1])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = vi.closest_hit(scene, o, d, cfg, t_max=tm, sort=False)
    jax.block_until_ready(out)
    np.asarray(out[0].ravel()[:1])
    dt = (time.time() - t0) / reps * 1000
    prim = np.asarray(out[1])
    hits = int((prim >= 0).sum())
    if ref_hits is None:
        ref_hits, base = prim, dt
    agree = float((prim == ref_hits).mean())
    print(f"PIPE={pipe:2d} EXIT_EVERY={ee}  d1 closest {dt:7.1f} ms  "
          f"ratio {dt/base:5.3f}  hits {hits}  agree {agree:.6f}",
          flush=True)
