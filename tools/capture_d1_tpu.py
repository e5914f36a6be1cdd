"""Dump the 1080p depth-1 bounce stream (first chunk after compaction)
WITH per-ray parent prim (the d0 hit triangle each bounce ray left from)
to /tmp/d1_stream.npz — offline sort-key sims (tools/sortkey_sim2.py,
sortkey_cell_sim.py) need the parent cell to test treelet-structured
grouping keys against the morton grid.
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

# d0 hit prim per lane (same launch shape as production's d0 closest)
f0 = jax.jit(lambda sc, o, d, t: inter.closest(
    sc, o, d, t, sort=False, coherent=True))
tm0 = jnp.where(state.alive, jnp.float32(1e30), 0.0)
prim0_parts = []
for c in range(4):
    sl = drv._slice(state, c)
    _, p, _, _ = f0(scene, sl.origin, sl.direction,
                    tm0[c * chunk:(c + 1) * chunk])
    prim0_parts.append(p)
prim0 = jnp.concatenate(prim0_parts)

# run the d0 stage + compaction exactly as production does
parts = []
for c in range(4):
    out, _, _, _ = drv._stage(scene, view, drv._slice(state, c),
                              jnp.uint32(0), jnp.int32(0), 0)
    parts.append(out)
state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
order, live_dev = drv._compact_keys(scene, state)
state = drv._compact_apply(state, order, m=n)
parent_prim = prim0[order]
print(f"after d0: live {int(live_dev)}", flush=True)

st1 = jax.tree.map(lambda a: a[:chunk], state)
pprim = np.asarray(parent_prim[:chunk])
tm = jnp.where(st1.alive, jnp.float32(1e30), 0.0)
f = jax.jit(lambda sc, o, d, t: inter.closest(sc, o, d, t, sort=False))
out0 = f(scene, st1.origin, st1.direction, tm)

tl = scene["treelets"]
stp = np.asarray(tl["slot_to_prim"])
k = int(tl["size"])
n_prims = int(stp.max()) + 1
prim_to_cell = np.full(n_prims, -1, np.int32)
valid = stp >= 0
prim_to_cell[stp[valid]] = (np.flatnonzero(valid) // k).astype(np.int32)

np.savez("/tmp/d1_stream.npz",
         origin=np.asarray(st1.origin),
         direction=np.asarray(st1.direction),
         tmax=np.asarray(tm), t_hit=np.asarray(out0[0]),
         parent_prim=pprim, prim_to_cell=prim_to_cell,
         bmin=np.asarray(tl["bmin"]), bmax=np.asarray(tl["bmax"]))
live = float((np.asarray(tm) > 0).mean())
pc = prim_to_cell[np.clip(pprim, 0, n_prims - 1)]
print(f"dumped /tmp/d1_stream.npz live {live:.2f} "
      f"parent-cell coverage {(pc[np.asarray(tm) > 0] >= 0).mean():.2f}",
      flush=True)
