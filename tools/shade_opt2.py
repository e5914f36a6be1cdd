"""Measure production get_shading_data: merged matlas vs legacy 3-fetch
vs no-tex, on the bench workload's primary-hit stream (518k lanes)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, visit_intersect as pi
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


def bench(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


@jax.jit
def prep(scene):
    O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
    t, prim, u, v = pi.closest_hit(scene, O, D, cfg,
                                   t_max=jnp.full(n, 1e30), sort=False)
    return t, jnp.maximum(prim, 0), u, v, D


t, prim, u, v, D = prep(scene)
np.asarray(t[:1])
cone = view["spread_angle"] * t
tf = {"diffuse": True, "normal": True, "rough": True}

f_merged = jax.jit(lambda sc, p, u, v, d, c: get_shading_data(
    sc, p, u, v, d, c, tex_flags=tf))
sd_m = bench("merged matlas", f_merged, scene, prim, u, v, D, cone)

legacy = {k: v for k, v in scene.items()
          if k not in ("matlas", "matlas_desc")}
sd_l = bench("legacy 3-fetch", f_merged, legacy, prim, u, v, D, cone)

no_tex = dict(legacy)
no_tex["atlas"] = None
no_tex["atlas_desc"] = None
bench("no-tex", f_merged, no_tex, prim, u, v, D, cone)

cm = np.asarray(sd_m[0]["color"])
cl = np.asarray(sd_l[0]["color"])
print("merged vs legacy color: mean|d|",
      np.abs(cm - cl).mean(), "max", np.abs(cm - cl).max(), flush=True)
