"""A/B the d0 FUSED light+env occlusion launch (2n lanes) under the
direction-major compaction keys, all four (sort x envelope) variants.

Context: env_d0_ab.py measured envelope enum faster on the light half
alone WITH THE OLD origin-major keys; after ccb6025 made ray_sort_keys
direction-major, the sorted fused stream's blocks scatter origins
image-wide and the envelope cull degenerates (driver_tail: d0 stage
780 -> 1177 ms/sample). This tool measures the real fused stream so the
integrator's (sort, coherent) choice is keyed to current reality.
"""
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


# the real d0 hits (closest as production runs it)
f_closest = jax.jit(lambda sc, o, d, t: inter.closest(
    sc, o, d, t, sort=False, coherent=True))
t_h, prim_h, u_h, v_h = bench_fn("d0 closest (tile, envelope)", f_closest,
                                 scene, st0.origin, st0.direction, tm)

# --- light NEE rays, exactly as depth_stage builds them ---------------------
from rfw_tpu.ops import rng as rng_mod  # noqa: E402
from rfw_tpu.ops import light_sampling  # noqa: E402
from rfw_tpu.ops.bsdf.common import dot3  # noqa: E402
from rfw_tpu.render.integrator import sample_envmap  # noqa: E402

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

# --- env NEE rays: one direction per 16x16 tile (il=256 path) ---------------
px = (st0.pid % jnp.uint32(W)).astype(jnp.int32)
py = (st0.pid // jnp.uint32(W)).astype(jnp.int32)
tb = 16
tiles_x = (W + tb - 1) // tb
tiles_y = (H + tb - 1) // tb
tid = jnp.arange(tiles_x * tiles_y, dtype=jnp.uint32)
gseed_t = rng_mod.wang_hash(
    rng_mod.path_seed(tid, jnp.uint32(0), 0) ^ jnp.uint32(0x517CC1B7))
_, re_t = rng_mod.random_float(gseed_t)
ed_t, ep_t, er_t = sample_envmap(scene, re_t)
gid = (py // tb) * tiles_x + (px // tb)
e_dir = ed_t[gid]
e_pdf = ep_t[gid]
e_cos = dot3(e_dir, st0.direction * -1.0)   # stand-in for i_n cosine gate
e_want = (prim_h >= 0) & (e_pdf > 0) & (e_cos > 0)

O2 = jnp.concatenate([s_origin, s_origin])
D2 = jnp.concatenate([l_dir, e_dir])
T2 = jnp.concatenate([s_dist, jnp.where(e_want, 1e30, 0.0)])

outs = {}
for sort in (True, False):
    for coh in (False, True):
        f = jax.jit(lambda sc, o, d, t, s=sort, c=coh: inter.occluded(
            sc, o, d, t, sort=s, coherent=c))
        outs[(sort, coh)] = bench_fn(
            f"fused occl sort={sort} coherent={coh}", f, scene, O2, D2, T2)
base = np.asarray(outs[(True, False)])
for k, v in outs.items():
    m = (np.asarray(v) == base).mean()
    print(f"  {k} match vs (True,False): {m:.6f}", flush=True)
