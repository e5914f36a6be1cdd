"""Merged-atlas x stochastic-filter A/B on the closest+shade jig.

Round-1 measured the merged atlas SLOWER under trilinear (8 big-table
taps vs 24 small-table taps; tools/shade_opt2.py). Under the stochastic
filter the comparison changes: merged = ONE tap total vs legacy = 3 taps
(one per map). Re-measure; also sanity-check the merged-stochastic mean
against merged-trilinear (unbiasedness).
"""
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
from rfw_tpu.ops import rng as rng_mod  # noqa: E402
import bench as benchmod  # noqa: E402

W, H = 1920, 1080
n = W * H // 4


def build(merged: bool):
    cfg = RenderConfig(merged_material_atlas=merged)
    rs = RenderSystem("wavefront", cfg)
    benchmod.build_scene(rs)
    rs.camera.resize(W, H)
    rs.camera.fov = 60.0
    rs.synchronize()
    eng = rs.context
    eng.resize(W, H)
    eng.update()
    return cfg, eng._scene, rs.camera.get_view().as_pytree()


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
for merged in (False, True):
    cfg, scene, view = build(merged)
    inter = FACTORIES["visit"](cfg)
    tp = integ._tile_permutation(W, W * H)
    pid = jnp.asarray(tp[0].astype(np.uint32))[:n]
    state = jax.jit(lambda sc: integ.make_path_state(
        sc, view, W, H, jnp.uint32(0), cfg, pid))(scene)

    def make(filt):
        @jax.jit
        def f(sc, st):
            tm = jnp.where(st.alive, jnp.float32(1e30), 0.0)
            t, prim, u, v = inter.closest(sc, st.origin, st.direction, tm,
                                          sort=False)
            prim_safe = jnp.maximum(prim, 0)
            cone = view["spread_angle"] * t
            seed = rng_mod.wang_hash(
                rng_mod.path_seed(st.pid, jnp.uint32(0), 0)
                ^ jnp.uint32(0x7FEB352D))
            sd, n_geom, i_n, t_vec, b_vec, ac = get_shading_data(
                sc, prim_safe, u, v, st.direction, cone, tex_filter=filt,
                stoch_seed=seed if filt == "stochastic" else None)
            return sd["color"], sd["roughness"], i_n
        return f

    tag = "merged" if merged else "legacy"
    for filt in ("stochastic", "trilinear"):
        outs[(tag, filt)] = bench_fn(
            f"closest+shade [{tag} {filt}]", make(filt), scene, state)

c_tri = np.asarray(outs[("merged", "trilinear")][0])
c_sto = np.asarray(outs[("merged", "stochastic")][0])
print(f"merged stoch-vs-tri mean color diff {np.abs(c_tri - c_sto).mean():.4f}"
      f" (bias {np.abs(c_tri.mean(0) - c_sto.mean(0)).max():.5f})",
      flush=True)
# cross-path: merged vs legacy stochastic means should agree to 8-bit
# quantization (the merged atlas stores RGBA8)
c_leg = np.asarray(outs[("legacy", "stochastic")][0])
print(f"merged-vs-legacy stochastic mean bias "
      f"{np.abs(c_leg.mean(0) - c_sto.mean(0)).max():.5f}", flush=True)
