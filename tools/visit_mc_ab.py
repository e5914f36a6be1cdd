"""A/B the visit-list cap M_C on the real depth-1 bounce stream.

The diag showed 67% of blocks overflow M_C=128 (union p90 375), so the
driver runs 4 recull passes — and every pass re-runs enum (27 ms) +
order (14 ms) + a full kernel grid over ALL blocks. A larger cap should
collapse the pass count; early exit bounds the extra kernel visits.

Also dumps the d1 stream to /tmp/d1_stream.npz for offline simulation
(tools/visit_blocksim.py).

Usage: python tools/visit_mc_ab.py [m_c ...]   (default: 128 192 256)
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
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
import bench as benchmod  # noqa: E402

caps = [int(a) for a in sys.argv[1:]] or [128, 192, 256]
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
state = drv._init(scene, view, jnp.uint32(0))
parts = []
for c in range(4):
    out, _, _, _ = drv._stage(scene, view, drv._slice(state, c),
                              jnp.uint32(0), jnp.int32(0), 0)
    parts.append(out)
state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
state, _ = drv._compact(scene, state)
st1 = jax.tree.map(lambda a: a[:chunk], state)
tm = jnp.where(st1.alive, jnp.float32(1e30), 0.0)

# dump the stream once for offline simulation
f = jax.jit(lambda sc, o, d, t: inter.closest(sc, o, d, t, sort=False))
out0 = f(scene, st1.origin, st1.direction, tm)
tl = scene["treelets"]
np.savez("/tmp/d1_stream.npz",
         origin=np.asarray(st1.origin), direction=np.asarray(st1.direction),
         tmax=np.asarray(tm), t_hit=np.asarray(out0[0]),
         bmin=np.asarray(tl["bmin"]), bmax=np.asarray(tl["bmax"]))
print("dumped /tmp/d1_stream.npz", flush=True)

ref = None
for cap in caps:
    vi.M_C = cap
    g = jax.jit(lambda sc, o, d, t: inter.closest(sc, o, d, t, sort=False))
    out = g(scene, st1.origin, st1.direction, tm)
    np.asarray(out[0].ravel()[:1])
    t0 = time.time()
    for _ in range(3):
        out = g(scene, st1.origin, st1.direction, tm)
    np.asarray(out[0].ravel()[:1])
    dt = (time.time() - t0) / 3 * 1000
    t_np, p_np = np.asarray(out[0]), np.asarray(out[1])
    if ref is None:
        ref = (t_np, p_np)
        tag = "(ref)"
    else:
        tag = (f"prim match {(p_np == ref[1]).mean():.6f} "
               f"t err {np.abs(t_np - ref[0]).max():.2e}")
    print(f"M_C={cap}: d1 closest {dt:.1f} ms  {tag}", flush=True)
