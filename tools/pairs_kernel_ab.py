"""Kernel-only A/B: per-cell interest skip on/off, on bounce-like pairs."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pair_intersect as pri
from rfw_tpu.ops.bsdf.common import safe_origin
from rfw_tpu.render.integrator import _tile_permutation
import bench as benchmod

W, ROWS = 1920, 270
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
n = W * ROWS
view = rs.camera.get_view().as_pytree()
perm, _ = _tile_permutation(W, n)
pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(W * 405)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
O = jnp.asarray(np.asarray(O))
D = jnp.asarray(np.asarray(D))
T_S = int(tl["sbmin"].shape[0])
k_size = int(tl["wplanes"].shape[2])
c_max = pri.C_MAX
wsup = pri._wsup(tl, 8)


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"  {label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


# primary hit points -> scattered bounce rays
fullp = jax.jit(lambda o, d, tm: pri.closest_hit(scene, o, d, cfg,
                                                 t_max=tm, sort=False))
t, prim, _, _ = fullp(O, D, jnp.full(n, 1e30))
hit = np.asarray(prim) >= 0
hp = O + D * jnp.where(jnp.asarray(hit), t, 0.0)[:, None]
so = safe_origin(hp, -D)
g = np.random.default_rng(0)
nd = g.normal(size=(n, 3)).astype(np.float32)
nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
nd = jnp.asarray(nd)
tmb = jnp.where(jnp.asarray(hit), 1e30, 0.0)

win = jnp.zeros(n, jnp.float32)
cand, keys, count, fin = jax.jit(
    lambda o, d, tm, w: pri.ray_super_candidates(o, d, tm, w, tl))(
        so, nd, tmb, win)
pair_sid, pair_flat = jax.jit(lambda c: pri.expand_pairs(c, T_S))(cand)
visits, nvisit = jax.jit(lambda c: pri.block_visit_lists(c, T_S))(pair_sid)
rows8 = jnp.concatenate([so, tmb[:, None], nd,
                         jnp.zeros((n, 1))], axis=1)
pr8 = jnp.where((pair_sid < T_S)[:, None], rows8[pair_flat // c_max], 0.0)
nb = pr8.shape[0] // pri.PBLOCK
rays8 = pr8.reshape(nb, pri.PBLOCK, 8).transpose(0, 2, 1).reshape(
    nb * 8, pri.PBLOCK)
sid_col = pair_sid.reshape(-1, 1)

for skip in (True, False):
    f = jax.jit(lambda r8, sc, v, nv, s=skip: pri._run_pair_kernel(
        r8, sc, v, nv, wsup, 8, k_size, float(cfg.t_epsilon), False,
        use_skip=s))
    ta, sa = bench(f"kernel use_skip={skip}", f, rays8, sid_col, visits,
                   nvisit)

# correctness: both agree
fa = jax.jit(lambda r8, sc, v, nv: pri._run_pair_kernel(
    r8, sc, v, nv, wsup, 8, k_size, float(cfg.t_epsilon), False, True))
fb = jax.jit(lambda r8, sc, v, nv: pri._run_pair_kernel(
    r8, sc, v, nv, wsup, 8, k_size, float(cfg.t_epsilon), False, False))
ta, sa = fa(rays8, sid_col, visits, nvisit)
tb, sb = fb(rays8, sid_col, visits, nvisit)
print("skip on/off agree:", bool((np.asarray(sa) == np.asarray(sb)).all()),
      flush=True)

# FULL closest on bounce rays (the number the v4 profile run never reached)
fullb = jax.jit(lambda o, d, tm: pri.closest_hit(scene, o, d, cfg,
                                                 t_max=tm, sort=True))
bench("FULL pairs bounce closest", fullb, so, nd, tmb, reps=3)
from rfw_tpu.ops import pallas_intersect as pi
supb = jax.jit(lambda o, d, tm: pi.closest_hit(scene, o, d, cfg,
                                               t_max=tm, sort=True))
bench("FULL super bounce closest", supb, so, nd, tmb, reps=3)

# shadow+env fused any-hit at depth1 (the integrator's real occlusion mix)
hit2 = np.asarray(fullb(so, nd, tmb)[1]) >= 0
hp2 = so + nd * jnp.where(jnp.asarray(hit2), 1.0, 0.0)[:, None]
ldir = jnp.asarray(np.tile([[0.26, 0.93, 0.26]], (n, 1)).astype(np.float32))
ed = g.normal(size=(n, 3)).astype(np.float32)
ed /= np.linalg.norm(ed, axis=-1, keepdims=True)
o2 = jnp.concatenate([hp2, hp2])
d2 = jnp.concatenate([ldir, jnp.asarray(ed)])
dist2 = jnp.concatenate([jnp.where(jnp.asarray(hit2), 20.0, 0.0),
                         jnp.where(jnp.asarray(hit2), 1e30, 0.0)])
ahp = jax.jit(lambda o, d, dd: pri.any_hit(scene, o, d, dd, cfg, sort=True))
bench("FULL pairs shadow+env any_hit 2n", ahp, o2, d2, dist2, reps=3)
ahs = jax.jit(lambda o, d, dd: pi.any_hit(scene, o, d, dd, cfg, sort=True))
bench("FULL super shadow+env any_hit 2n", ahs, o2, d2, dist2, reps=3)
