"""Ablate kernel-v2 per-visit cost on pica-4x primaries."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi
import bench as benchmod

size = 512
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(size, size); rs.camera.fov = 60.0
rs.synchronize(); eng = rs.context; eng.resize(size, size); eng.update()
scene = eng._scene
tl = scene["treelets"]
view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, size, size, 0)
O = jnp.asarray(np.asarray(O)); D = jnp.asarray(np.asarray(D))
tm = jnp.full(O.shape[0], 1e30)
o2, d2, tm2, _ = pi._pad_rays(O, D, tm)
ids, counts, ov, tnears = jax.jit(
    lambda o, d, t: pi.build_super_candidates(
        o, d, t, tl["sbmin"], tl["sbmax"], tl["bmin"], tl["bmax"]))(
    o2, d2, tm2)
rays = pi._pack_rays(o2, d2, tm2)
wsup = pi._wsup(tl)

# time the cull itself
cull = jax.jit(lambda o, d, t: pi.build_super_candidates(
    o, d, t, tl["sbmin"], tl["sbmax"], tl["bmin"], tl["bmax"]))
_ = cull(o2, d2, tm2)[0].block_until_ready()
t0 = time.time()
for _ in range(5):
    r = cull(o2, d2, tm2)
r[0].block_until_ready()
print(f"cull: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

for mode in ("", "all", "nodense"):
    os.environ["RFW_SV_ABLATE"] = mode
    pi._run_kernel.clear_cache()
    fn = jax.jit(lambda: pi._run_kernel(
        rays, ids, counts, ov.astype(jnp.int32), tnears, wsup,
        tl["sbmin"].shape[0], int(tl["size"]), 1e-4, False))
    t, slot, st = fn(); t.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        t, slot, st = fn()
    t.block_until_ready()
    st = np.asarray(st)
    print(f"mode={mode or 'normal':8s}: {(time.time()-t0)/5*1000:.1f} ms | "
          f"visits {st[:,0].mean():.1f} cells {st[:,1].mean():.1f}",
          flush=True)
