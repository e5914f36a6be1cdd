"""Sweep the pair kernel's PBLOCK (pairs per program) on the bounce
workload: per-program fixed cost (~6 us) argues for bigger blocks; VMEM
and tail-utilization argue for smaller."""
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

ref = None
for pb in (512, 1024, 2048):
    pri.PBLOCK = pb
    fn = jax.jit(lambda o, d, tm: pri.closest_hit(scene, o, d, cfg,
                                                  t_max=tm))
    out = fn(so, Db, tmb)
    np.asarray(out[0].ravel()[:1])
    t0 = time.time()
    for _ in range(3):
        out = fn(so, Db, tmb)
    np.asarray(out[0].ravel()[:1])
    p = np.asarray(out[1])
    if ref is None:
        ref = p
    print(f"PBLOCK={pb}: {(time.time()-t0)/3*1000:.1f} ms  "
          f"agree={(p == ref).mean():.4f}", flush=True)
