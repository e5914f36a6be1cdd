"""Per-phase attribution of depth_stage via RFW_STAGE_TRUNC (the §5
stage-tracing hook in render/integrator.py): times truncation levels
1..5 plus the full stage on the real d0 (coherent primary) and d1
(compacted bounce) streams of the 1080p bench scene, so each phase's
cost is the difference of consecutive levels.

Phases: 1 closest | 2 +shading data | 3 +sky/emissive | 4 +NEE math |
5 +occlusion | 0 full (+BSDF extension sample).

Usage: python tools/stage_trunc.py [d0|d1|both]
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render import integrator  # noqa: E402
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
import bench as benchmod  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "both"
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
scene = eng._scene
view = rs.camera.get_view().as_pytree()
inter = FACTORIES["visit"](cfg)

n = W * H
chunk = n // 4
drv = WavefrontDriver(W, H, cfg, inter, None, chunk)
state0_full = drv._init(scene, view, jnp.uint32(0))
st0 = jax.tree.map(lambda a: a[:chunk], state0_full)

streams = {}
if which in ("d0", "both"):
    streams["d0"] = (st0, 0)
if which in ("d1", "both"):
    parts = []
    for c in range(4):
        out, _, _, _ = drv._stage(scene, view, drv._slice(state0_full, c),
                                  jnp.uint32(0), jnp.int32(0), 0)
        parts.append(out)
    s = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
    s, _ = drv._compact(scene, s)
    streams["d1"] = (jax.tree.map(lambda a: a[:chunk], s), 1)

for name, (st, depth) in streams.items():
    print(f"--- {name} stream (518k lanes, depth={depth}) ---", flush=True)
    prev = 0.0
    for lvl in (1, 2, 3, 4, 5, 0):
        os.environ["RFW_STAGE_TRUNC"] = str(lvl)

        @functools.partial(jax.jit, static_argnames=("depth",))
        def stage(scene, view, state, depth):
            return integrator.depth_stage(
                scene, view, state, W, depth, jnp.uint32(0),
                jnp.int32(0), cfg, inter, tex_flags=None,
                sort_rays=False, height=H)

        out = stage(scene, view, st, depth=depth)
        np.asarray(out[0].radiance.ravel()[:1])
        t0 = time.time()
        for _ in range(3):
            out = stage(scene, view, st, depth=depth)
        np.asarray(out[0].radiance.ravel()[:1])
        dt = (time.time() - t0) / 3 * 1000
        lbl = {1: "closest", 2: "+shade", 3: "+emissive/sky", 4: "+NEE math",
               5: "+occlusion", 0: "full(+extension)"}[lvl]
        print(f"  {lbl:18s}: {dt:7.1f} ms  (delta {dt - prev:+7.1f})",
              flush=True)
        prev = dt
    os.environ["RFW_STAGE_TRUNC"] = "0"
