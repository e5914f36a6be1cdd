"""Profile the HOST side of the bench scene build (VERDICT r3 #6:
scene build < 2 s). Runs on the CPU platform (in-process switch) so the
chip claim is untouched; the axon upload time is measured separately by
the bench's scene-update log line (total - host = upload).

Usage: python tools/scene_build_profile.py [--legacy-atlas]
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
import bench as benchmod  # noqa: E402

cfg = RenderConfig(merged_material_atlas="--legacy-atlas" not in sys.argv)

t0 = time.time()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
t_load = time.time() - t0
print(f"asset load + host scene graph: {t_load:.2f}s", flush=True)

eng = rs.context
# pre-warm nothing: time the first synchronize (the bench's path)
prof = cProfile.Profile()
t0 = time.time()
prof.enable()
rs.synchronize()
prof.disable()
t_sync = time.time() - t0
print(f"synchronize (host build + CPU device_put): {t_sync:.2f}s",
      flush=True)

s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
ps.print_stats(30)
print(s.getvalue())

# second synchronize after touching one instance transform: the
# transforms-only / refit fast path cost
rs_insts = list(eng._instances.items())
if rs_insts:
    iid, (slot, tr) = rs_insts[0]
    tr2 = tr.copy()
    tr2[0, 3] += 0.01
    eng.set_instance(iid, slot, tr2)
    t0 = time.time()
    rs.synchronize()
    print(f"instance-move synchronize: {time.time() - t0:.2f}s",
          flush=True)
