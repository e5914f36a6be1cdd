"""Phase-level timing of the pair-expansion driver on the bounce workload:
enumeration / pair expansion / kernel / combine, plus pass count."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi, pair_intersect as pri
from rfw_tpu.ops.bsdf.common import safe_origin
from rfw_tpu.render.integrator import _tile_permutation
import bench as benchmod

W, H = 1920, 270
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
n = W * H
view = rs.camera.get_view().as_pytree()
perm, _ = _tile_permutation(W, n)
pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(1920 * 405)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)

t, prim, u, v = jax.jit(lambda o, d: pi.closest_hit(
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
so = safe_origin(jnp.asarray(np.asarray(O) + np.asarray(D)
                             * np.asarray(t)[:, None]), jnp.asarray(gn))
Db = jnp.asarray(db.astype(np.float32))
tmb = jnp.where(jnp.asarray(hit), 1e30, 0.0)

c_max = pri.C_MAX
t_s = int(tl["sbmin"].shape[0])
print(f"C_MAX={c_max}  supers={t_s}", flush=True)


def bench_fn(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


# phase 1: enumeration
win0 = jnp.zeros(n, jnp.float32)
enum = jax.jit(lambda o, d, tm, w: pri.ray_super_candidates(
    o, d, tm, w, tl, c_max=c_max))
cand, keys, count, complete = bench_fn("enumerate+select", enum,
                                       so, Db, tmb, win0)
cnt = np.asarray(count)
print(f"  candidates/ray: mean {cnt.mean():.1f} p90 "
      f"{np.percentile(cnt, 90):.0f} max {cnt.max()} "
      f"complete {np.asarray(complete).mean():.3f}", flush=True)

# phase 2: pair expansion sort
expand = jax.jit(lambda c: pri.expand_pairs(c, t_s))
pair_sid, pair_flat = bench_fn("expand_pairs sort", expand, cand)

visits = jax.jit(lambda s: pri.block_visit_lists(s, t_s))
vis, nv = bench_fn("block_visit_lists", visits, pair_sid)
print(f"  visits/block: mean {np.asarray(nv).mean():.2f}", flush=True)

# phase 3: kernel
super_g = 8
k_size = int(tl["wplanes"].shape[2])
wsup = pri._wsup(tl, super_g)


def run_kernel(ps, pf, vv, nn):
    live = (ps < t_s)[:, None]
    rows8 = jnp.concatenate([so, tmb[:, None], Db,
                             jnp.zeros((n, 1), jnp.float32)], axis=1)
    pr8 = jnp.where(live, rows8[pf // c_max], 0.0)
    nb = pr8.shape[0] // pri.PBLOCK
    rays8 = pr8.reshape(nb, pri.PBLOCK, 8).transpose(0, 2, 1).reshape(
        nb * 8, pri.PBLOCK)
    return pri._run_pair_kernel(rays8, ps.reshape(-1, 1), vv, nn, wsup,
                                super_g, k_size, float(cfg.t_epsilon),
                                False)


rk = jax.jit(run_kernel)
t_pair, slot_pair = bench_fn("gather rays + kernel", rk, pair_sid,
                             pair_flat, vis, nv)

# phase 4: combine
def combine(pf, tp, sp):
    _, t_back, s_back = jax.lax.sort((pf, tp, sp), num_keys=1,
                                     is_stable=True)
    t_mat = jnp.where(s_back[:n * c_max].reshape(n, c_max) >= 0,
                      t_back[:n * c_max].reshape(n, c_max), 1e30)
    k = jnp.argmin(t_mat, axis=1)
    return jnp.take_along_axis(t_mat, k[:, None], axis=1)[:, 0]


bench_fn("combine sort-back", jax.jit(combine), pair_flat, t_pair,
         slot_pair)

# full driver for reference + pass count
full = jax.jit(lambda o, d, tm: pri.closest_hit(scene, o, d, cfg, t_max=tm))
bench_fn("FULL pairs closest", full, so, Db, tmb)
