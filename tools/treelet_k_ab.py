"""A/B treelet size K (tris per cell / dense-test width) on the real d1
bounce closest launch. K=128 is one VPU lane row; K=64 halves per-visit
dense work IF the visit count doesn't inflate proportionally (finer cells
=> more cells crossed per block, bigger enum/sort tables).

Usage: python tools/treelet_k_ab.py [64 128 ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.ops import visit_intersect as vi  # noqa: E402
import dataclasses  # noqa: E402
import bench as benchmod  # noqa: E402

ks = [int(a) for a in sys.argv[1:]] or [64, 128]
npz = np.load("/tmp/d1_stream.npz")   # 1080p capture (visit_mc_ab.py)
o = jnp.asarray(npz["origin"])
d = jnp.asarray(npz["direction"])
tm = jnp.asarray(npz["tmax"])
print(f"stream {o.shape[0]} rays", flush=True)

for k in ks:
    cfg = RenderConfig(treelet_size=k)
    rs = RenderSystem("wavefront", cfg)
    benchmod.build_scene(rs)
    rs.synchronize()
    eng = rs.context
    eng.resize(64, 64)
    eng.update()
    scene = eng._scene
    t_c = scene["treelets"]["wplanes"].shape[0]

    def run(o=o, d=d, tm=tm, scene=scene, cfg=cfg):
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
    hits = int(np.asarray((out[1] >= 0).sum()))
    print(f"K={k:4d}  cells={t_c:6d}  d1 closest {dt:7.1f} ms  "
          f"hits {hits}", flush=True)
    del rs, eng, scene
