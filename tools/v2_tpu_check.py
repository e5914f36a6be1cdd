"""Kernel v2 on real TPU: parity vs CPU result + stage timing on pica-4x."""
import sys, time
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
print(f"cells {tl['bmin'].shape[0]} supers {tl['sbmin'].shape[0]} "
      f"K {int(tl['size'])}", flush=True)

view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, size, size, 0)
O = jnp.asarray(np.asarray(O)); D = jnp.asarray(np.asarray(D))
from rfw_tpu.render.integrator import _tile_permutation
perm, invp = _tile_permutation(size, size*size)
O = O[perm]; D = D[perm]

ch = jax.jit(lambda o, d: pi.closest_hit(scene, o, d, cfg, sort=False))
t0 = time.time()
t, prim, u, v = ch(O, D); t.block_until_ready()
print(f"primary compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(5): t, prim, u, v = ch(O, D)
t.block_until_ready()
dt = (time.time()-t0)/5
print(f"PRIMARY closest: {dt*1000:.1f} ms = {size*size/dt/1e6:.1f} Mrays/s "
      f"hit-rate {float((np.asarray(prim)>=0).mean()):.2f}", flush=True)

# scattered bounce rays
hitm = np.asarray(prim) >= 0
P = np.asarray(O + D * t[:, None])[hitm]
g = np.random.default_rng(0)
nd = g.normal(size=P.shape).astype(np.float32)
nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
n = len(P)
Pj, Dj = jnp.asarray(P), jnp.asarray(nd)
chs = jax.jit(lambda o, d: pi.closest_hit(scene, o, d, cfg, sort=True))
t2, prim2, _, _ = chs(Pj, Dj); t2.block_until_ready()
t0 = time.time()
for _ in range(5): t2, prim2, _, _ = chs(Pj, Dj)
t2.block_until_ready()
dt = (time.time()-t0)/5
print(f"BOUNCE closest ({n} rays): {dt*1000:.1f} ms = {n/dt/1e6:.1f} Mrays/s "
      f"hit-rate {float((np.asarray(prim2)>=0).mean()):.2f}", flush=True)

# occlusion
ah = jax.jit(lambda o, d, dist: pi.any_hit(scene, o, d, dist, cfg, sort=True))
occ = ah(Pj, Dj, jnp.full(n, 5.0)); occ.block_until_ready()
t0 = time.time()
for _ in range(5): occ = ah(Pj, Dj, jnp.full(n, 5.0))
occ.block_until_ready()
dt = (time.time()-t0)/5
print(f"ANY-HIT ({n} rays): {dt*1000:.1f} ms = {n/dt/1e6:.1f} Mrays/s "
      f"occ {float(np.asarray(occ).mean()):.2f}", flush=True)

# parity vs brute oracle on a subsample
from rfw_tpu.ops import traverse
idx = np.linspace(0, size*size-1, 4096).astype(np.int64)
tris = (scene["tri_vertices"][:, 0],
        scene["tri_vertices"][:, 1] - scene["tri_vertices"][:, 0],
        scene["tri_vertices"][:, 2] - scene["tri_vertices"][:, 0])
t_b, prim_b, _, _ = jax.jit(lambda o, d: traverse.traverse_wide(
    o, d, scene["bvh"], tris, leaf_size=4))(O[idx], D[idx])
pp = np.asarray(prim)[idx]; pb = np.asarray(prim_b)
agree = float((pp == pb).mean())
print(f"parity vs BVH oracle on 4096 rays: {agree:.4f}", flush=True)
mm = pp != pb
if mm.any():
    tt = np.asarray(t)[idx]; tb = np.asarray(t_b)
    print("mismatch t pallas vs oracle:",
          list(zip(tt[mm][:6].tolist(), tb[mm][:6].tolist())), flush=True)

# visit/cell stats straight from the kernel
def stats_for(o, d, tm, label, sort):
    if sort:
        order, _ = pi._sorted(tl, o, d, tm)
        o, d, tm = o[order], d[order], tm[order]
    o2, d2, tm2, _ = pi._pad_rays(o, d, tm)
    ids, counts, ov, tnears = pi.build_super_candidates(
        o2, d2, tm2, tl["sbmin"], tl["sbmax"], tl["bmin"], tl["bmax"])
    _, _, st = pi._run_kernel(pi._pack_rays(o2, d2, tm2), ids, counts,
                              ov.astype(jnp.int32), tnears,
                              pi._wsup(tl), tl["sbmin"].shape[0],
                              int(tl["size"]), 1e-4, False)
    st = np.asarray(st)
    print(f"{label}: visits mean {st[:,0].mean():.1f} p90 "
          f"{np.percentile(st[:,0],90):.0f} | cells mean {st[:,1].mean():.1f} "
          f"p90 {np.percentile(st[:,1],90):.0f} | cand mean {st[:,2].mean():.1f}"
          f" | full {st[:,3].mean()*100:.1f}%", flush=True)

stats_for(O, D, jnp.full(O.shape[0], 1e30), "PRIMARY", False)
stats_for(Pj, Dj, jnp.full(n, 1e30), "BOUNCE", True)
