"""A/B the PRODUCTION depth-0 stage (fused ray-gen + closest + shade +
NEE + fused light/env occlusion) at 1080p across the d0 occlusion
routing variants, in one process:

  base(nosort)    unsorted 2n fused launch, per-ray enum (the default:
                  blocks are tile-coherent under env_nee_interleave=256)
  sort            RFW_D0_OCCL_SORT=1 — the pre-session-2 sorted launch
  sort+env        + RFW_D0_OCCL_ENV=1 per-block envelope enumeration
  env             envelope on the unsorted stream

Measured 2026-08-19 (1080p pica-4x): 706.7 / 749.5 / 1155.1 / 2443.7 ms,
base bitwise == sort; env rows drift (MAX_PASSES exhaustion on the
conservative envelope lists — see STATUS.md).

The flags are read at TRACE time inside depth_stage, so each variant
builds a fresh jit. driver_tail cannot measure these: it drives every
depth through the traced-depth BOUNCE body, whose env-NEE gate is closed
at envmap_nee_max_depth=0 — the d0 static body is the only consumer of
the fused light+env launch. Usage: python tools/d0_stage_ab.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render.integrator import (depth_stage, make_path_state,  # noqa: E402
                                       _tile_permutation)
import bench as benchmod  # noqa: E402

W, H = 1920, 1080
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(W, H)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(W, H)
eng.update()
eng._get_trace_fn(W, H)
drv = eng._driver
assert drv is not None
scene = eng._scene
view = rs.camera.get_view().as_pytree()
n = W * H
chunk = n // 4
perm, _ = _tile_permutation(W, n)
pid_all = jnp.asarray(perm.astype(np.uint32))
tex_flags = drv._tex_flags
isect = drv._intersector

VARIANTS = [
    ("base(nosort)", {}),
    ("sort", {"RFW_D0_OCCL_SORT": "1"}),
    ("sort+env", {"RFW_D0_OCCL_SORT": "1", "RFW_D0_OCCL_ENV": "1"}),
    ("env", {"RFW_D0_OCCL_ENV": "1"}),
]

ref = None
for name, env in VARIANTS:
    for k in ("RFW_D0_OCCL_SORT", "RFW_D0_OCCL_ENV"):
        os.environ.pop(k, None)
    os.environ.update(env)

    @jax.jit
    def stage0(scene, view, pid_c, sample_index):
        st = make_path_state(scene, view, W, H, sample_index, cfg, pid_c)
        return depth_stage(scene, view, st, W, 0, sample_index,
                           jnp.int32(0), cfg, isect, tex_flags=tex_flags,
                           sort_rays=False, height=H)

    def run_all(si):
        outs = []
        for c in range(4):
            pid_c = pid_all[c * chunk:(c + 1) * chunk]
            out, stats, _, _ = stage0(scene, view, pid_c, jnp.uint32(si))
            outs.append(out.radiance)
        return jnp.concatenate(outs)

    rad = run_all(0)
    np.asarray(rad.ravel()[:1])
    t0 = time.time()
    reps = 3
    for i in range(reps):
        rad = run_all(0)
    np.asarray(rad.ravel()[:1])
    dt = (time.time() - t0) / reps * 1000
    rad_np = np.asarray(rad)
    if ref is None:
        ref = rad_np
        match = "ref"
    else:
        match = ("bitwise" if np.array_equal(ref, rad_np) else
                 f"MAXDIFF {np.abs(ref - rad_np).max():.3e}")
    print(f"{name:12s} d0 stage x4: {dt:7.1f} ms   [{match}]", flush=True)
