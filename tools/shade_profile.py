"""Shading-stage profile on pica-4x at 1080p-chunk scale (518k lanes).

Isolates: get_shading_data (gathers+texturing), BSDF eval/sample, NEE light
sampling, RNG — the non-intersection per-bounce costs.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, rng as rng_mod, light_sampling
from rfw_tpu.ops import visit_intersect as pri
from rfw_tpu.ops.bsdf import get as get_bsdf
from rfw_tpu.ops.shade import get_shading_data
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
n = W * ROWS
view = rs.camera.get_view().as_pytree()
perm, _ = _tile_permutation(W, n)
pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(W * 405)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
O = jnp.asarray(np.asarray(O))
D = jnp.asarray(np.asarray(D))


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


f = jax.jit(lambda o, d, tm: pri.closest_hit(scene, o, d, cfg, t_max=tm,
                                             sort=False))
t, prim, u, v = f(O, D, jnp.full(n, 1e30))
prim_safe = jnp.maximum(prim, 0)
cone = view["spread_angle"] * t

tex_flags = {"diffuse": True, "normal": True, "rough": True}
f_sd = jax.jit(lambda p, u, v, d, c: get_shading_data(
    scene, p, u, v, d, c, tex_flags=tex_flags))
sd, n_geom, i_n, t_vec, b_vec, alpha = bench(
    "get_shading_data (full tex)", f_sd, prim_safe, u, v, D, cone)

f_sd0 = jax.jit(lambda p, u, v, d, c: get_shading_data(
    scene, p, u, v, d, c,
    tex_flags={"diffuse": False, "normal": False, "rough": False}))
bench("get_shading_data (no tex)", f_sd0, prim_safe, u, v, D, cone)

bsdf = get_bsdf(cfg.bsdf)
f_ev = jax.jit(lambda sd, i_n, t_vec, b_vec, d: bsdf.evaluate_bsdf(
    sd, i_n, t_vec, b_vec, -d, i_n))
bench("bsdf.evaluate (disney)", f_ev, sd, i_n, t_vec, b_vec, D)

seed = rng_mod.wang_hash(jnp.arange(n, dtype=jnp.uint32))
f_sample = jax.jit(lambda sd, i_n, ng, tv, bv, d, t, s: bsdf.sample_bsdf(
    sd, i_n, ng, tv, bv, -d, t, jnp.zeros(n, bool),
    rng_mod.random_float(s)[1], rng_mod.random_float(s ^ 7)[1]))
bench("bsdf.sample (disney)", f_sample, sd, i_n, n_geom, t_vec, b_vec,
      D, t, seed)

hp = O + D * t[:, None]
f_nee = jax.jit(lambda r0, r1, hp, i_n: light_sampling.random_point_on_light(
    scene["lights"], r0, r1, hp, i_n, importance_sample=True))
bench("NEE random_point_on_light", f_nee,
      rng_mod.random_float(seed)[1], rng_mod.random_float(seed ^ 3)[1],
      hp, i_n)

# full shade-side of one bounce via trace_sample with brute-free... use the
# integrator with a no-op intersector to approximate: skip (hard to wire);
# instead, sum of parts above is the estimate.
print("done", flush=True)
