"""Isolate the visit-kernel TPU disagreement: which phase, which blocks."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi
from rfw_tpu.ops import visit_intersect as vi
from rfw_tpu.ops.bsdf.common import safe_origin
import bench as benchmod

cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(1920, 1080)
eng.update()
scene = eng._scene
tl = scene["treelets"]

n = 32768
view = rs.camera.get_view().as_pytree()
pid = jnp.arange(n, dtype=jnp.uint32) + np.uint32(1920 * 500)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
t, prim, _, _ = jax.jit(lambda o, d: pi.closest_hit(
    scene, o, d, cfg, t_max=jnp.full(n, 1e30), sort=False))(O, D)
hit = np.asarray(prim) >= 0
gn = np.asarray(scene["tri_gnormal"])[np.maximum(np.asarray(prim), 0)]
sgn = np.where((np.asarray(D) * gn).sum(-1, keepdims=True) > 0, -1.0, 1.0)
gn = gn * sgn
g = np.random.default_rng(0)
r = g.normal(size=(n, 3)).astype(np.float32)
r /= np.linalg.norm(r, axis=-1, keepdims=True)
db = gn + 0.999 * r
db /= np.linalg.norm(db, axis=-1, keepdims=True)
hp = np.asarray(O) + np.asarray(D) * np.asarray(t)[:, None]
so = np.asarray(safe_origin(jnp.asarray(hp), jnp.asarray(gn)))
Db = db.astype(np.float32)
tmb = np.where(hit, 1e30, 0.0).astype(np.float32)

# pre-sort ONCE so both paths see identical block composition
order = np.asarray(vi._sorted(tl, jnp.asarray(so), jnp.asarray(Db),
                              jnp.asarray(tmb))[0])
so, Db, tmb = so[order], Db[order], tmb[order]
soj, Dbj, tmbj = jnp.asarray(so), jnp.asarray(Db), jnp.asarray(tmb)

t_s, p_s, _, _ = jax.jit(lambda o, d, tm: pi.closest_hit(
    scene, o, d, cfg, t_max=tm, sort=True))(soj, Dbj, tmbj)
t_v, p_v, _, _ = jax.jit(lambda o, d, tm: vi.closest_hit(
    scene, o, d, cfg, t_max=tm, sort=False))(soj, Dbj, tmbj)
p_s, p_v = np.asarray(p_s), np.asarray(p_v)
dis = p_s != p_v
print(f"disagree {dis.mean():.4f} ({dis.sum()} rays)", flush=True)

# overflow status of each block on the FIRST pass
rays8 = vi._pack_rays8(soj, Dbj, tmbj)
wg, bounds8, super_g, k_size = vi._granularity(tl, cfg)
b_entry = np.asarray(vi.block_entries(rays8, bounds8))
nb = n // vi.BLOCK
counts_full = (b_entry < 1e29).sum(axis=1)
of = counts_full > vi.M_C
print(f"blocks {nb}, overflow pass-1: {of.mean():.3f}", flush=True)
dis_b = dis.reshape(nb, vi.BLOCK).any(1)
print(f"blocks with disagreement: {dis_b.mean():.3f}; "
      f"of those overflowed: {of[dis_b].mean():.3f}; "
      f"disagreeing rays in overflow blocks: "
      f"{of[np.arange(n) // vi.BLOCK][dis].mean():.3f}", flush=True)

# enum correctness: numpy reference for block entries
bm = np.asarray(tl["bmin"]); bx = np.asarray(tl["bmax"])
inv = 1.0 / np.where(np.abs(Db) < 1e-12,
                     np.where(Db < 0, -1e-12, 1e-12), Db)
ref = np.full((nb, bm.shape[0]), 1e30, np.float32)
for b in range(nb):
    s = slice(b * vi.BLOCK, (b + 1) * vi.BLOCK)
    t1 = (bm[None] - so[s, None]) * inv[s, None]
    t2 = (bx[None] - so[s, None]) * inv[s, None]
    tn = np.maximum(np.minimum(t1, t2).max(-1), 0.0)
    tf = np.maximum(t1, t2).min(-1)
    cr = tn < np.minimum(tf, tmb[s, None])
    e = np.where(cr, tn, 1e30)
    ref[b] = e.min(0)
err = np.abs(np.where(ref < 1e29, ref, 0) -
             np.where(b_entry < 1e29, b_entry, 0))
mask_mismatch = (ref < 1e29) != (b_entry < 1e29)
print(f"enum: mask mismatches {mask_mismatch.sum()}, "
      f"max entry err {err.max():.2e}", flush=True)
