"""Candidate counts for bounce-like rays (sorted scattered) on pica-4x."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi
from rfw_tpu.ops.compaction import ray_sort_keys
import bench as benchmod

size = 512
rs = RenderSystem("wavefront", RenderConfig())
benchmod.build_scene(rs)
rs.camera.resize(size, size); rs.camera.fov = 60.0
rs.synchronize(); eng = rs.context; eng.resize(size, size); eng.update()
scene = eng._scene
tl = scene["treelets"]
view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, size, size, 0)
O = jnp.asarray(np.asarray(O)); D = jnp.asarray(np.asarray(D))

# primary hits -> bounce origins
t, prim, u, v = jax.jit(lambda o, d: pi.closest_hit(scene, o, d, RenderConfig()))(O, D)
hitm = np.asarray(prim) >= 0
P = np.asarray(O + D * t[:, None])[hitm]
rng = np.random.default_rng(0)
nd = rng.normal(size=P.shape).astype(np.float32)
nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
n_rays = (len(P) // 256) * 256
P, nd = P[:n_rays], nd[:n_rays]
print("bounce rays:", n_rays, flush=True)

# sort like the intersector does
lo = np.asarray(tl["bmin"]).min(0); hi = np.asarray(tl["bmax"]).max(0)
keys = np.asarray(ray_sort_keys(jnp.asarray(P), jnp.asarray(nd), jnp.asarray(lo), jnp.asarray(hi)))
order = np.argsort(keys)
Ps, Ds = jnp.asarray(P[order]), jnp.asarray(nd[order])

cand = jax.jit(lambda o, d, tm: pi.build_candidates(o, d, tm, tl["bmin"], tl["bmax"]))
tm = jnp.full(n_rays, 1e30)
ids, counts, overflow, tnears = cand(Ps, Ds, tm)
c = np.asarray(counts); ov = np.asarray(overflow)
print(f"sorted bounce counts: mean {c.mean():.0f} p50 {np.percentile(c,50):.0f} p90 {np.percentile(c,90):.0f} max {c.max()} overflow {ov.mean()*100:.1f}%", flush=True)

# unsorted for comparison
ids2, counts2, ov2, _ = cand(jnp.asarray(P), jnp.asarray(nd), tm)
c2 = np.asarray(counts2)
print(f"unsorted bounce counts: mean {c2.mean():.0f} p90 {np.percentile(c2,90):.0f} overflow {np.asarray(ov2).mean()*100:.1f}%", flush=True)

# kernel timing on sorted bounce rays
krn = jax.jit(lambda ids, counts, ov, tn, rays: pi._run_kernel(
    rays, ids, counts, ov, tn, tl["wplanes"], tl["bmin"].shape[0],
    int(tl["wplanes"].shape[2]), 1e-4, False))
rays = pi._pack_rays(Ps, Ds, tm)
tt, slot = krn(ids, counts, overflow.astype(jnp.int32), tnears, rays); tt.block_until_ready()
t0=time.time()
for _ in range(3): tt, slot = krn(ids, counts, overflow.astype(jnp.int32), tnears, rays)
tt.block_until_ready()
print(f"bounce kernel: {(time.time()-t0)/3*1000:.0f} ms for {n_rays} rays", flush=True)
