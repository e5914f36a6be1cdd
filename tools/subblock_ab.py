"""On-chip A/B of the two-level union restriction (visit_subblocks):
the d1 bounce closest launch on the captured 1080p stream, S in
{1, 2, 4, 8} sub-block lists per 256-ray block.

The kernel's dense work per step is S-invariant (S disjoint (256/S, K)
ops == one (256, K) op on the VPU); steps per block drop from
|union(block)| to max_s |union(sub_s)| at the price of S DMAs per step
and S-row candidate tables (enum output, sort width, SMEM windows).
tools/subblock_sim.py predicts the step ratio offline; this measures the
real end-to-end launch including the enum/sort tables.

Usage: python tools/subblock_ab.py [1 2 4 8] [--regroup]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.ops import visit_intersect as vi  # noqa: E402
import bench as benchmod  # noqa: E402

args = [a for a in sys.argv[1:] if not a.startswith("--")]
subs = [int(a) for a in args] or [1, 2, 4, 8]
regroup = "--regroup" in sys.argv[1:]

npz = np.load("/tmp/d1_stream.npz")
o = jnp.asarray(npz["origin"])
d = jnp.asarray(npz["direction"])
tm = jnp.asarray(npz["tmax"])
print(f"stream {o.shape[0]} rays, regroup={regroup}", flush=True)

cfg0 = RenderConfig()
rs = RenderSystem("wavefront", cfg0)
benchmod.build_scene(rs)
rs.synchronize()
eng = rs.context
eng.resize(64, 64)
eng.update()
scene = eng._scene

base = None
ref_hits = None
for s in subs:
    cfg = dataclasses.replace(cfg0, visit_subblocks=s,
                              visit_regroup=regroup)

    def run(cfg=cfg):
        return vi.closest_hit(scene, o, d, cfg, t_max=tm, sort=False)

    out = run()
    jax.block_until_ready(out)
    np.asarray(out[0].ravel()[:1])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = run()
    jax.block_until_ready(out)
    np.asarray(out[0].ravel()[:1])
    dt = (time.time() - t0) / reps * 1000
    prim = np.asarray(out[1])
    hits = int((prim >= 0).sum())
    if ref_hits is None:
        ref_hits = prim
        base = dt
        agree = 1.0
    else:
        agree = float((prim == ref_hits).mean())
    print(f"S={s}  d1 closest {dt:7.1f} ms  ratio {dt/base:5.3f}  "
          f"hits {hits}  prim-agree {agree:.6f}", flush=True)
