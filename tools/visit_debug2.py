"""Classify visit-kernel disagreements: is the true cell (a) within the
first-128 visit list (kernel bug), (b) beyond it (recull bug), or (c) not
a candidate at all (enum bug)? Then re-run one failing block in isolation."""
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
K = int(tl["wplanes"].shape[2])
T_c = int(np.asarray(tl["bmin"]).shape[0])

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
order = np.asarray(vi._sorted(tl, jnp.asarray(so), jnp.asarray(Db),
                              jnp.asarray(tmb))[0])
so, Db, tmb = so[order], Db[order], tmb[order]
soj, Dbj, tmbj = jnp.asarray(so), jnp.asarray(Db), jnp.asarray(tmb)

t_s, p_s, _, _ = jax.jit(lambda o, d, tm: pi.closest_hit(
    scene, o, d, cfg, t_max=tm, sort=True))(soj, Dbj, tmbj)
t_v, p_v, _, _ = jax.jit(lambda o, d, tm: vi.closest_hit(
    scene, o, d, cfg, t_max=tm, sort=False))(soj, Dbj, tmbj)
t_s, p_s = np.asarray(t_s), np.asarray(p_s)
t_v, p_v = np.asarray(t_v), np.asarray(p_v)
dis = p_s != p_v
print(f"disagree {dis.mean():.4f} ({dis.sum()})", flush=True)
print(f"  super hit & visit miss: {((p_s >= 0) & (p_v < 0) & dis).sum()}",
      flush=True)
print(f"  super miss & visit hit: {((p_s < 0) & (p_v >= 0) & dis).sum()}",
      flush=True)
both = (p_s >= 0) & (p_v >= 0) & dis
print(f"  both hit, different prim: {both.sum()}; of those visit-t "
      f"closer: {(t_v[both] < t_s[both]).sum()}, super-t closer: "
      f"{(t_s[both] < t_v[both]).sum()}", flush=True)

# prim -> cell map
stp = np.asarray(tl["slot_to_prim"])
n_prim = int(np.asarray(scene["tri_vertices"]).shape[0])
prim2slot = np.full(n_prim, -1, np.int64)
valid = stp >= 0
prim2slot[stp[valid]] = np.arange(len(stp))[valid]

rays8 = vi._pack_rays8(soj, Dbj, tmbj)
wg, bounds8, super_g, k_size = vi._granularity(tl, cfg)
b_entry = np.asarray(vi.block_entries(rays8, bounds8))
nb = n // vi.BLOCK

# numpy replica of order_candidates (pass 1, wm=0)
cb = vi._cid_bits(T_c)
qmax = (1 << (24 - cb)) - 1
lo = np.asarray(tl["scene_lo"]); hi = np.asarray(tl["scene_hi"])
diag = float(np.sqrt(((hi - lo) ** 2).sum()))
q = np.clip(np.floor(b_entry * (qmax / diag)), 0, qmax).astype(np.float64)
key = np.where(b_entry < 1e29, q * (1 << cb) + np.arange(T_c)[None],
               float(1 << 25))
ordk = np.argsort(key, axis=1, kind="stable")
rank = np.empty_like(ordk)
np.put_along_axis(rank, ordk, np.arange(T_c)[None].repeat(nb, 0), axis=1)

bad = np.where(dis & (p_s >= 0))[0]
cls = {"in128": 0, "beyond128": 0, "notcand": 0}
for ray in bad:
    blk = ray // vi.BLOCK
    cell = prim2slot[p_s[ray]] // K
    if b_entry[blk, cell] >= 1e29:
        cls["notcand"] += 1
    elif rank[blk, cell] < vi.M_C:
        cls["in128"] += 1
    else:
        cls["beyond128"] += 1
print("classification of (super-hit) disagreements:", cls, flush=True)

# detail one in-128 failure and re-run its block alone through the kernel
for ray in bad:
    blk = ray // vi.BLOCK
    cell = prim2slot[p_s[ray]] // K
    if b_entry[blk, cell] < 1e29 and rank[blk, cell] < vi.M_C:
        cnt = int((key[blk] < (1 << 25)).sum())
        print(f"ray {ray} blk {blk}: true cell {cell} at visit rank "
              f"{rank[blk, cell]}, block count {cnt} "
              f"(overflow {cnt > vi.M_C}), t_s {t_s[ray]:.4f} "
              f"t_v {t_v[ray]:.4f} p_v {p_v[ray]}", flush=True)
        # single-block rerun
        ids, counts, ovf, tnears, keys = map(np.asarray, vi.order_candidates(
            jnp.asarray(b_entry[blk:blk + 1]), jnp.zeros(1, jnp.float32),
            jnp.float32(diag), vi.M_C))
        r8 = np.asarray(rays8).reshape(nb, 8, vi.BLOCK)[blk]
        t1b, s1b = vi._run_visit_kernel(
            jnp.asarray(r8), jnp.asarray(ids), jnp.asarray(counts),
            jnp.asarray(tnears), wg, super_g, k_size,
            float(cfg.t_epsilon), False)
        lane = ray % vi.BLOCK
        t1b, s1b = np.asarray(t1b), np.asarray(s1b)
        print(f"  single-block rerun: t {t1b[lane]:.4f} slot {s1b[lane]} "
              f"cell {s1b[lane] // K if s1b[lane] >= 0 else -1}",
              flush=True)
        break
