"""Perf A/B: pair-expansion intersector vs super-cell kernel on pica-4x.

Primary rays (coherent), bounce rays (scattered, 45% dead), shadow+env
any-hit — the integrator's real stage mix at 512x512 and optionally 1080p.
"""
import os
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

W = int(os.environ.get("BW", "1920"))
H = int(os.environ.get("BH", "270"))
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
perm, invp = _tile_permutation(W, n)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0,
                                    pixel_ids=jnp.asarray(
                                        perm.astype(np.uint32)))
O = jnp.asarray(np.asarray(O))
D = jnp.asarray(np.asarray(D))


def bench(label, fn, *args, reps=3):
    out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms  ({n/dt/1e6:.2f} Mrays/s)", flush=True)
    return out


impls = {
    "super": pi,
    "pairs": pri,
}
g = np.random.default_rng(0)
tm_full = jnp.full(n, 1e30)

res = {}
for name, mod in impls.items():
    ch_ns = jax.jit(lambda o, d, tm, m=mod: m.closest_hit(
        scene, o, d, cfg, t_max=tm, sort=False))
    ch_s = jax.jit(lambda o, d, tm, m=mod: m.closest_hit(
        scene, o, d, cfg, t_max=tm, sort=True))
    ah_s = jax.jit(lambda o, d, dist, m=mod: m.any_hit(
        scene, o, d, dist, cfg, sort=True))

    t, prim, u, v = bench(f"{name}: primary closest (nosort)", ch_ns,
                          O, D, tm_full)
    hit = np.asarray(prim) >= 0
    res[name] = (np.asarray(t), np.asarray(prim))
    print(f"  hit-rate {hit.mean():.3f}", flush=True)

    hp = O + D * jnp.where(jnp.asarray(hit), t, 0.0)[:, None]
    so = safe_origin(hp, -D)
    nd = g.normal(size=(n, 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
    tmb = jnp.where(jnp.asarray(hit), 1e30, 0.0)
    t2, prim2, _, _ = bench(f"{name}: bounce closest (sorted, "
                            f"{100*(1-hit.mean()):.0f}% dead)",
                            ch_s, so, jnp.asarray(nd), tmb)
    hit2 = np.asarray(prim2) >= 0

    ldir = jnp.asarray(np.tile([[0.26, 0.93, 0.26]], (n, 1)).astype(
        np.float32))
    sdist = jnp.where(jnp.asarray(hit), 20.0, 0.0)
    o2 = jnp.concatenate([so, so])
    d2 = jnp.concatenate([ldir, jnp.asarray(nd)])
    dist2 = jnp.concatenate([sdist, jnp.where(jnp.asarray(hit), 1e30, 0.0)])
    bench(f"{name}: shadow+env any_hit 2n (sorted)", ah_s, o2, d2, dist2)

    # deep bounce: 28% alive scattered
    hp2 = so + jnp.asarray(nd) * jnp.where(jnp.asarray(hit2), t2, 0.0)[:, None]
    so2 = safe_origin(hp2, -jnp.asarray(nd))
    nd2 = g.normal(size=(n, 3)).astype(np.float32)
    nd2 /= np.linalg.norm(nd2, axis=-1, keepdims=True)
    tmb2 = jnp.where(jnp.asarray(hit2), 1e30, 0.0)
    bench(f"{name}: bounce2 closest (sorted, "
          f"{100*(1-hit2.mean()):.0f}% dead)", ch_s, so2,
          jnp.asarray(nd2), tmb2)

# cross-impl agreement on primaries
(ta, pa), (tb, pb) = res["super"], res["pairs"]
agree = (pa == pb).mean()
both = (pa >= 0) & (pb >= 0)
terr = np.abs(ta[both] - tb[both]) / np.maximum(tb[both], 1e-6)
print(f"primary agreement super vs pairs: prim {agree:.5f}, "
      f"t err max {terr.max():.2e}")
