"""Dump the 1080p depth-2 bounce stream (first chunk after compaction)
to /tmp/d2_stream.npz for offline regroup simulation — settles the d2
survivor fraction at bench resolution (the 640x360 CPU capture measured
32%, above the first n/4 batch).
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
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
scene = eng._scene
view = rs.camera.get_view().as_pytree()
inter = FACTORIES["visit"](cfg)

n = W * H
chunk = n // 4
drv = WavefrontDriver(W, H, cfg, inter, None, chunk)
state = drv._init(scene, view, jnp.uint32(0))
for depth in (0, 1):
    parts = []
    live = n if depth == 0 else int(live_dev)  # noqa: F821
    n_chunks = max(1, -(-live // chunk))
    for c in range(n_chunks):
        out, _, _, _ = drv._stage(scene, view, drv._slice(state, c),
                                  jnp.uint32(0), jnp.int32(0), depth)
        parts.append(out)
    tail = jax.tree.map(lambda a: a[n_chunks * chunk:], state)
    state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts, tail)
    order, live_dev = drv._compact_keys(scene, state)
    state = drv._compact_apply(state, order, m=n)
    print(f"after d{depth}: live {int(live_dev)}", flush=True)

st2 = jax.tree.map(lambda a: a[:chunk], state)
tm = jnp.where(st2.alive, jnp.float32(1e30), 0.0)
f = jax.jit(lambda sc, o, d, t: inter.closest(sc, o, d, t, sort=False))
out0 = f(scene, st2.origin, st2.direction, tm)
tl = scene["treelets"]
np.savez("/tmp/d2_stream.npz",
         origin=np.asarray(st2.origin),
         direction=np.asarray(st2.direction),
         tmax=np.asarray(tm), t_hit=np.asarray(out0[0]),
         bmin=np.asarray(tl["bmin"]), bmax=np.asarray(tl["bmax"]))
print(f"dumped /tmp/d2_stream.npz  live {float((tm > 0).mean()):.2f}",
      flush=True)

# --- d1-vertex occlusion stream (the fused shadow launch): the bench
# scene is env-lit (test sky), so the launch is envmap shadow rays with
# ONE sampled direction per 16x16 image tile (env_nee_interleave),
# origins at the scattered d1 hit points, dist unbounded. t_hit from a
# closest run stands in for "first occluder" (conservative for any-hit).
hit_pos = np.asarray(st2.origin)   # d2 origins ARE d1 hit points
pid = np.asarray(st2.pid)
px, py = pid % W, pid // W
tiles_x = (W + 15) // 16
gid = (py // 16) * tiles_x + (px // 16)
rng = np.random.default_rng(7)
tdirs = rng.normal(size=(tiles_x * ((H + 15) // 16) + 1, 3))
tdirs[:, 1] = np.abs(tdirs[:, 1])            # skyward bias like the CDF
tdirs /= np.linalg.norm(tdirs, axis=-1, keepdims=True)
od = jnp.asarray(tdirs[gid], jnp.float32)
occ_tm = np.where(np.asarray(st2.alive), 1e30, 0.0).astype(np.float32)
out1 = f(scene, jnp.asarray(hit_pos, jnp.float32), od,
         jnp.asarray(occ_tm))
np.savez("/tmp/occl_d1_stream.npz",
         origin=hit_pos, direction=np.asarray(od),
         tmax=occ_tm, t_hit=np.asarray(out1[0]),
         bmin=np.asarray(tl["bmin"]), bmax=np.asarray(tl["bmax"]))
occluded = (np.asarray(out1[1]) >= 0) & (np.asarray(out1[0]) < occ_tm)
print(f"dumped /tmp/occl_d1_stream.npz  occluded "
      f"{occluded[occ_tm > 0].mean():.2f}", flush=True)
