"""Per-RAY crossed-granule statistics + treelet_size A/B on the real
depth-1 bounce stream. Usage: python tools/visit_diag2.py [treelet_size].

Decides whether the visit kernel's ~200-granule block unions are union
WASTE (per-ray crossings << union → tighter blocks help) or intrinsic
(per-ray crossings ~ union → only smaller granules / cheaper visits
help)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import dataclasses  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.ops import visit_intersect as vi  # noqa: E402
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
import bench as benchmod  # noqa: E402

tl_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = dataclasses.replace(RenderConfig(), treelet_size=tl_size)
W, H = 1920, 1080
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

tl = scene["treelets"]
wg, bounds8, super_g, k_size = vi._granularity(tl, cfg)
T = bounds8.shape[1]
print(f"treelet_size={tl_size}: T={T} K={k_size}", flush=True)

tm = jnp.where(st1.alive, jnp.float32(1e30), 0.0)

# ---- closest time at this treelet size --------------------------------
f = jax.jit(lambda sc, o, d, t: inter.closest(sc, o, d, t, sort=False))
out = f(scene, st1.origin, st1.direction, tm)
np.asarray(out[0].ravel()[:1])
t0 = time.time()
for _ in range(3):
    out = f(scene, st1.origin, st1.direction, tm)
np.asarray(out[0].ravel()[:1])
print(f"d1 closest: {(time.time() - t0) / 3 * 1000:.1f} ms", flush=True)
t_hit = out[0]

# ---- per-ray crossings (sampled) --------------------------------------
S = 8192
sel = slice(0, S)
lo3 = bounds8[0:3].T[None]          # (1, T, 3)
hi3 = bounds8[3:6].T[None]


@jax.jit
def crossings(o, d, tmax_r, thit_r):
    safe = jnp.where(jnp.abs(d) < 1e-12,
                     jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = (1.0 / safe)[:, None]     # (S, 1, 3)
    t1 = (lo3 - o[:, None]) * inv
    t2 = (hi3 - o[:, None]) * inv
    ent = jnp.max(jnp.minimum(t1, t2), axis=-1)
    ext = jnp.min(jnp.maximum(t1, t2), axis=-1)
    live = (tmax_r > 0)[:, None]
    cross_tm = (ent < jnp.minimum(ext, tmax_r[:, None])) & live
    cross_hit = (ent < jnp.minimum(ext, thit_r[:, None])) & live
    return jnp.sum(cross_tm, axis=1), jnp.sum(cross_hit, axis=1)


c_tm, c_hit = crossings(st1.origin[sel], st1.direction[sel], tm[sel],
                        jnp.minimum(t_hit[sel], tm[sel]))
c_tm = np.asarray(c_tm)
c_hit = np.asarray(c_hit)
alive = np.asarray(tm[sel]) > 0
miss = np.asarray(t_hit[sel] >= 1e29) & alive
print(f"per-ray crossed granules (to t_max):  mean {c_tm[alive].mean():.0f}"
      f" p50 {np.percentile(c_tm[alive], 50):.0f}"
      f" p90 {np.percentile(c_tm[alive], 90):.0f}", flush=True)
print(f"per-ray crossed granules (to hit t):  mean {c_hit[alive].mean():.0f}"
      f" p50 {np.percentile(c_hit[alive], 50):.0f}"
      f" p90 {np.percentile(c_hit[alive], 90):.0f}", flush=True)
print(f"miss fraction of live rays: {miss.mean():.2f}; "
      f"miss-ray crossings mean {c_tm[miss].mean() if miss.any() else 0:.0f}",
      flush=True)

# union for comparison
o, d, tmax, r = vi._pad_rays(st1.origin, st1.direction, tm)
rays8 = jax.jit(vi._pack_rays8)(o, d, tmax)
b_entry = vi.block_entries(rays8, bounds8)
crossed = np.asarray(jnp.sum(b_entry < vi.BIG_T, axis=1))
print(f"block union size: mean {crossed.mean():.0f} "
      f"p50 {np.percentile(crossed, 50):.0f}", flush=True)
