"""Split a BOUNCE (depth-1) chunk's cost on the real chip. Depth 1 runs
~665 ms/chunk vs depth 0's ~335 (driver_profile) — this isolates where:
closest on the compacted stream, shading, occlusion (sorted vs not),
extension sampling."""
import dataclasses
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
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
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

n = W * H
chunk = n // 4
drv = WavefrontDriver(W, H, cfg, inter, None, chunk)

# produce the REAL depth-1 stream: d0 over 4 chunks, then compact
state = drv._init(scene, view, jnp.uint32(0))
parts = []
for c in range(4):
    out, _, _, _ = drv._stage(scene, view, drv._slice(state, c),
                              jnp.uint32(0), jnp.int32(0), 0)
    parts.append(out)
state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
state, live = drv._compact(scene, state)
live = int(live)
print(f"live at d1: {live} ({live / n:.2f})", flush=True)
st1 = drv._slice(state, 0)   # first (live-dense) chunk


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


# occlusion in isolation: NEE shadow rays from d1 hit points
@jax.jit
def occl_prep(sc, st):
    from rfw_tpu.ops import light_sampling, rng
    from rfw_tpu.ops.bsdf.common import dot3, safe_origin
    tm = jnp.where(st.alive, jnp.float32(1e30), 0.0)
    t, prim, u, v = inter.closest(sc, st.origin, st.direction, tm,
                                  sort=False)
    prim_safe = jnp.maximum(prim, 0)
    hit = st.origin + st.direction * t[..., None]
    cone = view["spread_angle"] * t
    sd, n_geom, i_n, t_vec, b_vec, ac = get_shading_data(
        sc, prim_safe, u, v, st.direction, cone,
        tex_filter=cfg.texture_filter)
    seed = rng.wang_hash(rng.path_seed(st.pid, jnp.uint32(0), 1)
                         ^ jnp.uint32(0x9E3779B9))
    seed, (r0, r1) = rng.random_floats(seed, 2)
    ls = light_sampling.random_point_on_light(
        sc["lights"], r0, r1, hit, i_n,
        importance_sample=cfg.importance_sample_lights)
    l_vec = ls["position"] - hit
    dist = jnp.sqrt(jnp.maximum(dot3(l_vec, l_vec), 1e-20))
    l_dir = l_vec / dist[..., None]
    so = safe_origin(hit, n_geom)
    want = st.alive & (prim >= 0) & (dot3(l_dir, i_n) > 0)
    sdist = jnp.where(want, dist - 2e-4, 0.0)
    return so, l_dir, sdist


so, l_dir, sdist = jax.jit(occl_prep)(scene, st1)
occ_sorted = jax.jit(lambda sc, o, d, s: inter.occluded(sc, o, d, s,
                                                        sort=True))
occ_nosort = jax.jit(lambda sc, o, d, s: inter.occluded(sc, o, d, s,
                                                        sort=False))

stage1 = jax.jit(lambda sc, st: integ.depth_stage(
    sc, view, st, W, 1, jnp.uint32(0), jnp.int32(0), cfg, inter,
    sort_rays=False, height=H))
stage1_novr = jax.jit(lambda sc, st: integ.depth_stage(
    sc, view, st, W, 1, jnp.uint32(0), jnp.int32(0),
    dataclasses.replace(cfg, variance_reduction=False), inter,
    sort_rays=False, height=H))
# final depth (2): no extension sampling
stage2 = jax.jit(lambda sc, st: integ.depth_stage(
    sc, view, st, W, cfg.max_path_length, jnp.uint32(0), jnp.int32(0),
    cfg, inter, sort_rays=False, height=H))

bench_fn("d1 closest only", closest_only, scene, st1)
bench_fn("d1 closest+shading", closest_shade, scene, st1)
bench_fn("d1 NEE occl sorted", occ_sorted, scene, so, l_dir, sdist)
bench_fn("d1 NEE occl nosort", occ_nosort, scene, so, l_dir, sdist)
bench_fn("d1 stage no NEE", stage1_novr, scene, st1)
bench_fn("d1 stage full", stage1, scene, st1)
bench_fn("dfinal stage full", stage2, scene, st1)
