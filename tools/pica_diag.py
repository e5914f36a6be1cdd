import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi
import bench as benchmod

size = 512
rs = RenderSystem("wavefront", RenderConfig())
benchmod.build_scene(rs)
rs.camera.resize(size, size); rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context; eng.resize(size, size); eng.update()
scene = jax.tree.map(lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, eng._scene)
tl = scene["treelets"]
print("treelets:", tl["bmin"].shape[0], flush=True)
view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, size, size, 0)
O = jnp.asarray(np.asarray(O)); D = jnp.asarray(np.asarray(D))

cand = jax.jit(lambda o, d, tm: pi.build_candidates(o, d, tm, tl["bmin"], tl["bmax"]))
tm = jnp.full(O.shape[0], 1e30)
t0=time.time(); ids, counts, overflow, tnears = cand(O, D, tm); counts.block_until_ready()
print(f"cull compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time()
for _ in range(3): ids, counts, overflow, tnears = cand(O, D, tm)
counts.block_until_ready()
print(f"cull run {(time.time()-t0)/3*1000:.0f}ms", flush=True)
c = np.asarray(counts); ov = np.asarray(overflow)
print(f"counts: mean {c.mean():.0f} p50 {np.percentile(c,50):.0f} p90 {np.percentile(c,90):.0f} max {c.max()}, overflow {ov.mean()*100:.1f}%", flush=True)

krn = jax.jit(lambda ids, counts, ov, tn, rays: pi._run_kernel(
    rays, ids, counts, ov, tn, tl["wplanes"], tl["bmin"].shape[0], int(tl["wplanes"].shape[2]), 1e-4, False))
rays = pi._pack_rays(O, D, tm)
t0=time.time(); t, slot = krn(ids, counts, overflow.astype(jnp.int32), tnears, rays); t.block_until_ready()
print(f"kernel compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time()
for _ in range(3): t, slot = krn(ids, counts, overflow.astype(jnp.int32), tnears, rays)
t.block_until_ready()
print(f"kernel run {(time.time()-t0)/3*1000:.0f}ms, hitrate {float((np.asarray(slot)>=0).mean()):.2f}", flush=True)
