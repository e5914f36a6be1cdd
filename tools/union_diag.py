"""Per-block EXACT cell-union sizes for bounce rays on pica-4x.

Sizes the round-2 architecture bet: a per-block visit-list kernel whose
candidates are the exact union of its rays' crossed cells (not the
conservative block-envelope of pallas_intersect.py, whose unions measured
~102 supers for scattered rays). Reports unions at cell + super
granularity, with and without a per-ray horizon at the actual hit t (what
front-to-back early exit approaches), for several block sizes.

CPU-only statistics — run with JAX_PLATFORMS=cpu.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from rfw_tpu.system import RenderSystem           # noqa: E402
from rfw_tpu.config import RenderConfig           # noqa: E402
from rfw_tpu.ops import raygen                    # noqa: E402
from rfw_tpu.ops.traverse import traverse_wide    # noqa: E402
from rfw_tpu.ops.compaction import ray_sort_keys  # noqa: E402
import bench as benchmod                          # noqa: E402

size = 512
cfg = RenderConfig()
rs = RenderSystem("megakernel", cfg)
benchmod.build_scene(rs)
rs.camera.resize(size, size)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(size, size)
eng.update()
scene = eng._scene
tl = scene["treelets"]
bmin = np.asarray(tl["bmin"])
bmax = np.asarray(tl["bmax"])
T_c = bmin.shape[0]
from rfw_tpu.ops.pallas_intersect import SUPER_G  # noqa: E402
print(f"cells {T_c} supers {T_c // SUPER_G}", flush=True)

view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, size, size, 0)
t0 = time.time()
v3 = scene["tri_vertices"]
tris = (v3[:, 0], v3[:, 1] - v3[:, 0], v3[:, 2] - v3[:, 0])
hit = jax.jit(lambda o, d: traverse_wide(o, d, scene["bvh"], tris,
                                         t_epsilon=cfg.t_epsilon))
t, prim, u, v = hit(O, D)
t, prim = np.asarray(t), np.asarray(prim)
print(f"primary closest (bvh cpu): {time.time() - t0:.1f} s, "
      f"{(prim >= 0).mean() * 100:.0f}% hit", flush=True)

hm = prim >= 0
P = np.asarray(O + D * t[:, None])[hm]
tri = np.asarray(scene["tri_vertices"])[np.maximum(prim[hm], 0)]
n_g = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
n_g /= np.maximum(np.linalg.norm(n_g, axis=-1, keepdims=True), 1e-20)
d_in = np.asarray(D)[hm]
n_g *= np.where((n_g * d_in).sum(-1, keepdims=True) > 0, -1.0, 1.0)

# cosine-hemisphere continuation directions around the shading normal
rng = np.random.default_rng(1)
r1, r2 = rng.random(len(P)), rng.random(len(P))
st = np.sqrt(r1)
local = np.stack([st * np.cos(2 * np.pi * r2), st * np.sin(2 * np.pi * r2),
                  np.sqrt(1 - r1)], -1).astype(np.float32)
up = np.where(np.abs(n_g[:, 2:3]) < 0.9,
              np.array([0, 0, 1], np.float32), np.array([1, 0, 0],
                                                        np.float32))
tx = np.cross(up, n_g)
tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-20)
ty = np.cross(n_g, tx)
nd = (local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n_g)
nd = (nd / np.linalg.norm(nd, axis=-1, keepdims=True)).astype(np.float32)
P = (P + n_g * 1e-4).astype(np.float32)

n_rays = (len(P) // 512) * 512
P, nd = P[:n_rays], nd[:n_rays]
print(f"bounce rays: {n_rays}", flush=True)

# bounce hit t (the horizon a perfect front-to-back visit order reaches)
t_b = np.asarray(hit(jnp.asarray(P), jnp.asarray(nd))[0])
t_hor = np.where(np.isfinite(t_b) & (t_b < 1e29), t_b * 1.0001, 1e30)

lo = np.asarray(tl.get("scene_lo", bmin.min(0)))
hi = np.asarray(tl.get("scene_hi", bmax.max(0)))
keys = np.asarray(ray_sort_keys(jnp.asarray(P), jnp.asarray(nd),
                                jnp.asarray(lo), jnp.asarray(hi)))
order = np.argsort(keys, kind="stable")
Ps, Ds, Th = P[order], nd[order], t_hor[order]

inv = 1.0 / np.where(np.abs(Ds) < 1e-12,
                     np.where(Ds < 0, -1e-12, 1e-12), Ds)


def crossed(horizon):
    """(N, T_c) bool — ray crosses cell within [0, horizon)."""
    out = np.zeros((n_rays, T_c), bool)
    for s in range(0, n_rays, 4096):
        e = min(s + 4096, n_rays)
        tn = np.zeros((e - s, T_c), np.float32)
        tf = np.full((e - s, T_c), 3e38, np.float32)
        for ax in range(3):
            t1 = (bmin[None, :, ax] - Ps[s:e, None, ax]) * inv[s:e, None,
                                                               ax]
            t2 = (bmax[None, :, ax] - Ps[s:e, None, ax]) * inv[s:e, None,
                                                               ax]
            tn = np.maximum(tn, np.minimum(t1, t2))
            tf = np.minimum(tf, np.maximum(t1, t2))
        out[s:e] = (tn < np.minimum(tf, horizon[s:e, None]))
    return out


for name, horizon in [("no horizon", np.full(n_rays, 1e30, np.float32)),
                      ("hit-t horizon", Th)]:
    x = crossed(horizon)
    per_ray = x.sum(1)
    print(f"\n== {name} ==")
    print(f"per-ray crossed cells: mean {per_ray.mean():.1f} "
          f"p50 {np.percentile(per_ray, 50):.0f} "
          f"p90 {np.percentile(per_ray, 90):.0f} max {per_ray.max()}")
    for B in (128, 256, 512):
        nb = n_rays // B
        u_cell = x.reshape(nb, B, T_c).any(1).sum(-1)
        xs = x.reshape(nb, B, T_c // SUPER_G, SUPER_G).any(-1)
        u_sup = xs.any(1).sum(-1)
        print(f"  B={B:4d}: cell union mean {u_cell.mean():6.1f} "
              f"p90 {np.percentile(u_cell, 90):6.0f} "
              f"max {u_cell.max():5d} | super union mean {u_sup.mean():5.1f} "
              f"p90 {np.percentile(u_sup, 90):4.0f} max {u_sup.max()}")
