"""Visit-list vs pairs vs super-cell on the REAL bench workloads
(1080p pica-4x middle chunk): primary closest (coherent, unsorted),
bounce closest (cosine-scattered, 45% dead), fused occlusion stream.
Run on the real TPU chip."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi
from rfw_tpu.ops import pair_intersect as pri
from rfw_tpu.ops import visit_intersect as vi
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
n = W * H
view = rs.camera.get_view().as_pytree()
perm, _ = _tile_permutation(W, n)
pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(1920 * 405)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)


def bench_fn(label, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


import dataclasses
cfg_s = dataclasses.replace(cfg, visit_granularity="super")
tm_full = jnp.full(n, 1e30)
ch_sup_u = jax.jit(lambda o, d, tm: pi.closest_hit(scene, o, d, cfg,
                                                   t_max=tm, sort=False))
ch_vis_u = jax.jit(lambda o, d, tm: vi.closest_hit(scene, o, d, cfg,
                                                   t_max=tm, sort=False))
ch_visS_u = jax.jit(lambda o, d, tm: vi.closest_hit(scene, o, d, cfg_s,
                                                    t_max=tm, sort=False))
ch_sup = jax.jit(lambda o, d, tm: pi.closest_hit(scene, o, d, cfg,
                                                 t_max=tm, sort=True))
ch_pair = jax.jit(lambda o, d, tm: pri.closest_hit(scene, o, d, cfg,
                                                   t_max=tm))
ch_vis = jax.jit(lambda o, d, tm: vi.closest_hit(scene, o, d, cfg,
                                                 t_max=tm, sort=True))
ch_visS = jax.jit(lambda o, d, tm: vi.closest_hit(scene, o, d, cfg_s,
                                                  t_max=tm, sort=True))

print("== primary closest (coherent, unsorted) ==", flush=True)
t, prim, _, _ = bench_fn("SUPER", ch_sup_u, O, D, tm_full)
t_v, p_v, _, _ = bench_fn("VISIT/cell", ch_vis_u, O, D, tm_full)
bench_fn("VISIT/super", ch_visS_u, O, D, tm_full)
agree = (np.asarray(prim) == np.asarray(p_v)).mean()
print(f"primary prim agreement {agree:.5f}", flush=True)

hit = np.asarray(prim) >= 0
print(f"hit-rate {hit.mean():.2f}", flush=True)

gn = np.asarray(scene["tri_gnormal"])[np.maximum(np.asarray(prim), 0)]
sgn = np.where((np.asarray(D) * gn).sum(-1, keepdims=True) > 0, -1.0, 1.0)
gn = gn * sgn
g = np.random.default_rng(0)
r = g.normal(size=(n, 3)).astype(np.float32)
r /= np.linalg.norm(r, axis=-1, keepdims=True)
db = gn + 0.999 * r
db /= np.linalg.norm(db, axis=-1, keepdims=True)
hp = np.asarray(O) + np.asarray(D) * np.asarray(t)[:, None]
so = safe_origin(jnp.asarray(hp), jnp.asarray(gn))
Db = jnp.asarray(db.astype(np.float32))
tmb = jnp.where(jnp.asarray(hit), 1e30, 0.0)

print("== bounce closest (scattered, 45% dead) ==", flush=True)
t_s, p_s, _, _ = bench_fn("SUPER", ch_sup, so, Db, tmb)
t_p, p_p, _, _ = bench_fn("PAIRS", ch_pair, so, Db, tmb)
t_v, p_v, _, _ = bench_fn("VISIT/cell", ch_vis, so, Db, tmb)
bench_fn("VISIT/super", ch_visS, so, Db, tmb)
print(f"prim agreement visit-vs-pairs "
      f"{(np.asarray(p_v) == np.asarray(p_p)).mean():.5f} "
      f"visit-vs-super {(np.asarray(p_v) == np.asarray(p_s)).mean():.5f} "
      f"pairs-vs-super {(np.asarray(p_p) == np.asarray(p_s)).mean():.5f}",
      flush=True)

print("== occlusion (coherent to-light, 2n fused analog) ==", flush=True)
lp = np.array([0.0, 15.0, 0.0], np.float32)
lv = lp[None] - np.asarray(so)
dist = np.linalg.norm(lv, axis=-1)
ld = (lv / np.maximum(dist[:, None], 1e-9)).astype(np.float32)
dd = jnp.where(jnp.asarray(hit), jnp.asarray(dist - 1e-3), 0.0)
ah_sup = jax.jit(lambda o, d, dist: pi.any_hit(scene, o, d, dist, cfg,
                                               sort=True))
ah_vis = jax.jit(lambda o, d, dist: vi.any_hit(scene, o, d, dist, cfg,
                                               sort=True))
ah_visS = jax.jit(lambda o, d, dist: vi.any_hit(scene, o, d, dist, cfg_s,
                                                sort=True))
o_s = bench_fn("SUPER", ah_sup, so, jnp.asarray(ld), dd)
o_v = bench_fn("VISIT/cell", ah_vis, so, jnp.asarray(ld), dd)
bench_fn("VISIT/super", ah_visS, so, jnp.asarray(ld), dd)
print(f"occl agreement {(np.asarray(o_s) == np.asarray(o_v)).mean():.5f}",
      flush=True)
