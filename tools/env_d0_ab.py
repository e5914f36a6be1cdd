"""A/B the envelope vs per-ray enumeration on the REAL d0 primary stream
(pixel-tile order, 518k lanes) and on the d0 shadow stream; plus merged
vs legacy shade in-pipeline."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
import bench as benchmod  # noqa: E402

W, H = 1920, 1080
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(W, H)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(W, H)
eng.update()
scene = eng._scene
view = rs.camera.get_view().as_pytree()
inter = FACTORIES["visit"](cfg)

n = W * H
chunk = n // 4
drv = WavefrontDriver(W, H, cfg, inter, None, chunk)
state = drv._init(scene, view, jnp.uint32(0))
st0 = jax.tree.map(lambda a: a[:chunk], state)
tm = jnp.where(st0.alive, jnp.float32(1e30), 0.0)


def bench_fn(label, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time() - t0) / reps * 1000:.1f} ms", flush=True)
    return out


outs = {}
for coh in (False, True):
    f = jax.jit(lambda sc, o, d, t, c=coh: inter.closest(
        sc, o, d, t, sort=False, coherent=c))
    outs[coh] = bench_fn(f"d0 closest coherent={coh}", f, scene,
                         st0.origin, st0.direction, tm)
t0, p0 = np.asarray(outs[False][0]), np.asarray(outs[False][1])
t1, p1 = np.asarray(outs[True][0]), np.asarray(outs[True][1])
print(f"prim match {(p0 == p1).mean():.6f} t err {np.abs(t0 - t1).max():.2e}",
      flush=True)

# --- occlusion streams: envelope A/B ---------------------------------------
from rfw_tpu.render import integrator as integ  # noqa: E402
from rfw_tpu.ops import rng as rng_mod  # noqa: E402
from rfw_tpu.ops import light_sampling  # noqa: E402
from rfw_tpu.ops.bsdf.common import dot3, safe_origin  # noqa: E402

# build the d0 shadow stream exactly as depth_stage does (light NEE rays)
t_h, prim_h, u_h, v_h = outs[True]
hit_pos = st0.origin + st0.direction * t_h[..., None]
seed = rng_mod.wang_hash(
    rng_mod.path_seed(st0.pid, jnp.uint32(0), 0) ^ jnp.uint32(0x9E3779B9))
seed, (r0, r1) = rng_mod.random_floats(seed, 2)
ls = light_sampling.random_point_on_light(
    scene["lights"], r0, r1, hit_pos, st0.direction,
    importance_sample=cfg.importance_sample_lights)
l_vec = ls["position"] - hit_pos
dist = jnp.sqrt(jnp.maximum(dot3(l_vec, l_vec), 1e-20))
l_dir = l_vec / dist[..., None]
want = (prim_h >= 0) & (ls["light_pdf"] > 0)
s_origin = hit_pos + l_dir * 1e-4
s_dist = jnp.where(want, dist - 2e-4, 0.0)

for coh in (False, True):
    f = jax.jit(lambda sc, o, d, t, c=coh: inter.occluded(
        sc, o, d, t, sort=True, coherent=c))
    outs[("occ", coh)] = bench_fn(f"d0 light occl coherent={coh}", f,
                                  scene, s_origin, l_dir, s_dist)
o0 = np.asarray(outs[("occ", False)])
o1 = np.asarray(outs[("occ", True)])
print(f"occl match {(o0 == o1).mean():.6f}", flush=True)
