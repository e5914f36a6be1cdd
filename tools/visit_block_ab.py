"""A/B the visit-kernel BLOCK size on the real depth-1 bounce stream.

The per-block visit list is the UNION of 256 rays' crossed granules
(mean 201 vs per-ray mean 20 — tools/visit_diag2.py): most dense work is
wasted on rays that never cross the visited granule. Halving BLOCK
halves the per-visit compute AND tightens the union; the question is
whether per-program fixed costs (~5-7 us) and DMA latency eat the win.

Usage: python tools/visit_block_ab.py [block ...]   (default: 256 128 64)
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

blocks = [int(a) for a in sys.argv[1:]] or [256, 128, 64]
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

ref = None
for blk in blocks:
    vi.BLOCK = blk
    g = jax.jit(lambda sc, o, d, t: inter.closest(sc, o, d, t, sort=False))
    try:
        out = g(scene, st1.origin, st1.direction, tm)
        np.asarray(out[0].ravel()[:1])
    except Exception as e:
        print(f"BLOCK={blk}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        continue
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
    print(f"BLOCK={blk}: d1 closest {dt:.1f} ms  {tag}", flush=True)
vi.BLOCK = 256
