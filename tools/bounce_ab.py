"""Super-cell vs pair-expansion closest-hit on the REAL bounce workload
(cosine-scattered from depth-0 hit points, 45% dead lanes, middle 1080p
chunk of pica-4x). The end-to-end hybrid A/B said pairs loses overall;
this isolates the bounce stage where pairs should win."""
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


ch_sup = jax.jit(lambda o, d, tm: pi.closest_hit(scene, o, d, cfg,
                                                 t_max=tm, sort=True))
ch_pair = jax.jit(lambda o, d, tm: pri.closest_hit(scene, o, d, cfg,
                                                   t_max=tm))

t, prim, u, v = jax.jit(lambda o, d: pi.closest_hit(
    scene, o, d, cfg, t_max=jnp.full(n, 1e30), sort=False))(O, D)
hit = np.asarray(prim) >= 0
print(f"hit-rate {hit.mean():.2f}", flush=True)

# cosine-weighted bounce directions around the geometric normal
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

t_s, p_s, _, _ = bench_fn("bounce closest SUPER (sorted)", ch_sup, so, Db,
                          tmb)
t_p, p_p, _, _ = bench_fn("bounce closest PAIRS", ch_pair, so, Db, tmb)
agree = (np.asarray(p_s) == np.asarray(p_p)).mean()
print(f"prim agreement {agree:.4f}", flush=True)

# shadow stream (coherent to-light dirs, 2n fused) for completeness
ah_sup = jax.jit(lambda o, d, dist: pi.any_hit(scene, o, d, dist, cfg,
                                               sort=True))
ah_pair = jax.jit(lambda o, d, dist: pri.any_hit(scene, o, d, dist, cfg))
ldir = jnp.asarray(np.tile([[0.26, 0.93, 0.26]], (n, 1)).astype(np.float32))
sdist = jnp.where(jnp.asarray(hit), 20.0, 0.0)
o2 = jnp.concatenate([so, so])
d2 = jnp.concatenate([ldir, Db])
dist2 = jnp.concatenate([sdist, jnp.where(jnp.asarray(hit), 1e30, 0.0)])
bench_fn("shadow+env any SUPER (2n)", ah_sup, o2, d2, dist2)
bench_fn("shadow+env any PAIRS (2n)", ah_pair, o2, d2, dist2)
