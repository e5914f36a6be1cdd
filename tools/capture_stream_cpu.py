"""Capture depth-1/2 bounce streams on CPU (bvh intersector, pica scene,
640x360) for offline regroup simulation — de-risks the d2 survivor
fraction (if > n_b/n, _trace_regroup's phase C fires) without the TPU.

Writes /tmp/d{1,2}_stream_cpu.npz in the regroup_sim format: the rays
ENTERING each bounce depth's closest-hit launch in compaction order,
their brute t_hit, and the treelet cell bounds.

Usage: python tools/capture_stream_cpu.py [W H]
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
import bench as benchmod  # noqa: E402

W = int(sys.argv[1]) if len(sys.argv) > 1 else 640
H = int(sys.argv[2]) if len(sys.argv) > 2 else 360
cfg = RenderConfig()
rs = RenderSystem("megakernel", cfg)
benchmod.build_scene(rs)
rs.camera.resize(W, H)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(W, H)
eng.update()
scene = eng._scene
view = rs.camera.get_view().as_pytree()
mats = eng._materials or {}
tex_flags = {
    "diffuse": bool(np.any(np.asarray(
        mats.get("tex0_id", np.array([-1]))) >= 0)),
    "normal": bool(np.any(np.asarray(
        mats.get("tex1_id", np.array([-1]))) >= 0)),
    "rough": bool(np.any(np.asarray(
        mats.get("tex3_id", np.array([-1]))) >= 0)),
}

intersector = FACTORIES["bvh"](cfg)
drv = WavefrontDriver(W, H, cfg, intersector, tex_flags, chunk=W * H)
n = W * H

state = None
for depth in range(cfg.max_path_length + 1):
    if depth == 0:
        out, _, _, _ = drv._stage0(scene, view,
                                   jnp.asarray(drv._pid_np),
                                   jnp.uint32(0), jnp.int32(0))
        state = out
    else:
        o = np.asarray(state.origin)
        d = np.asarray(state.direction)
        tmax = np.where(np.asarray(state.alive), 1e30, 0.0).astype(
            np.float32)
        t, prim, _, _ = intersector.closest(scene, state.origin,
                                            state.direction, sort=False)
        t_hit = np.where(np.asarray(prim) >= 0, np.asarray(t),
                         1e30).astype(np.float32)
        tl = scene["treelets"]
        np.savez(f"/tmp/d{depth}_stream_cpu.npz",
                 origin=o, direction=d, tmax=tmax, t_hit=t_hit,
                 bmin=np.asarray(tl["bmin"]), bmax=np.asarray(tl["bmax"]))
        live = (tmax > 0).mean()
        print(f"d{depth}: dumped {n} rays, live {live:.2f}", flush=True)
        out, _, _, _ = drv._stage(scene, view, state, jnp.uint32(0),
                                  jnp.int32(0), depth)
        state = out
    if depth < cfg.max_path_length:
        order, live_dev = drv._compact_keys(scene, state)
        state = drv._compact_apply(state, order, m=n)
print("done", flush=True)
