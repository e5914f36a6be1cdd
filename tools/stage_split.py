"""Split one depth-0 chunk's cost into components on the real chip:
raygen / closest / +shading / +light-NEE / +env-NEE / full stage."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render import integrator as integ  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
from rfw_tpu.ops.shade import get_shading_data  # noqa: E402
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

n = W * H // 4      # one 518k chunk
tp = integ._tile_permutation(W, W * H)
pid_full = jnp.asarray(tp[0].astype(np.uint32))
pid = pid_full[:n]

state = jax.jit(lambda: integ.make_path_state(
    scene, view, W, H, jnp.uint32(0), cfg, pid))()


def bench_fn(label, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time() - t0) / reps * 1000:.1f} ms", flush=True)
    return out


@jax.jit
def closest_only(sc, st):
    tm = jnp.where(st.alive, jnp.float32(1e30), 0.0)
    return inter.closest(sc, st.origin, st.direction, tm, sort=False)


@jax.jit
def closest_shade(sc, st):
    tm = jnp.where(st.alive, jnp.float32(1e30), 0.0)
    t, prim, u, v = inter.closest(sc, st.origin, st.direction, tm,
                                  sort=False)
    prim_safe = jnp.maximum(prim, 0)
    cone = view["spread_angle"] * t
    sd, n_geom, i_n, t_vec, b_vec, ac = get_shading_data(
        sc, prim_safe, u, v, st.direction, cone,
        tex_filter=cfg.texture_filter)
    return sd["color"], i_n


def stage(sc, st, c):
    return integ.depth_stage(sc, view, st, W, 0, jnp.uint32(0),
                             jnp.int32(0), c, inter, sort_rays=False,
                             height=H)


import dataclasses  # noqa: E402
stage_novr = jax.jit(lambda sc, st: stage(
    sc, st, dataclasses.replace(cfg, variance_reduction=False)))
stage_noenv = jax.jit(lambda sc, st: stage(
    sc, st, dataclasses.replace(cfg, envmap_nee=False)))
stage_full = jax.jit(lambda sc, st: stage(sc, st, cfg))

bench_fn("closest only", closest_only, scene, state)
bench_fn("closest+shading", closest_shade, scene, state)
bench_fn("d0 stage no NEE", stage_novr, scene, state)
bench_fn("d0 stage light NEE only", stage_noenv, scene, state)
bench_fn("d0 stage full", stage_full, scene, state)

# compaction cost at frame size
full_state = jax.jit(lambda: integ.make_path_state(
    scene, view, W, H, jnp.uint32(0), cfg, pid_full))()
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
drv = WavefrontDriver(W, H, cfg, inter, None, n)
bench_fn("compaction (2.07M rows)", drv._compact, scene, full_state)
bench_fn("finalize (pid restore)", drv._finalize, full_state)
