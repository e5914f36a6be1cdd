"""tvisit (transposed sub-cell core) vs visit (production) on the REAL
1080p bench workloads — run on chip after tools/capture_d1_tpu.py has
written /tmp/d1_stream.npz.

Streams: captured d1 bounce closest (the stage the round-4 budget says
the visit architecture caps at ~23 Mrays/s), coherent primary closest
(envelope enum), and a d1-derived occlusion stream.

Usage: python tools/r5_tvisit_ab.py [--cpu] [--skip-primary]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.ops import raygen  # noqa: E402
from rfw_tpu.ops import visit_intersect as vi  # noqa: E402
from rfw_tpu.ops import tvisit_intersect as tv  # noqa: E402
from rfw_tpu.render.integrator import _tile_permutation  # noqa: E402
import bench as benchmod  # noqa: E402

cfg = RenderConfig(subcell_tables=True)   # tvisit needs the child tables
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(1920, 1080)
eng.update()
scene = eng._scene
view = rs.camera.get_view().as_pytree()


def bench_fn(label, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{label}: {(time.time()-t0)/reps*1000:7.1f} ms", flush=True)
    return out


def agree(a, b, tag):
    pa, pb = np.asarray(a[1]), np.asarray(b[1])
    m = (pa >= 0) == (pb >= 0)
    both = (pa >= 0) & (pb >= 0)
    eq = (pa[both] == pb[both]).mean() if both.any() else 1.0
    print(f"  {tag}: found-mask agree {m.mean():.6f}, prim agree "
          f"{eq:.6f}", flush=True)


# --- captured d1 bounce stream ---
try:
    npz = np.load("/tmp/d1_stream.npz")
    o1 = jnp.asarray(npz["origin"])
    d1 = jnp.asarray(npz["direction"])
    tm1 = jnp.asarray(npz["tmax"])
    print(f"d1 stream: {o1.shape[0]} rays, live "
          f"{(np.asarray(tm1) > 0).mean():.2f}", flush=True)
    f_vis = jax.jit(lambda o, d, t: vi.closest_hit(
        scene, o, d, cfg, t_max=t, sort=False))
    f_tv = jax.jit(lambda o, d, t: tv.closest_hit(
        scene, o, d, cfg, t_max=t, sort=False))
    a = bench_fn("d1 closest visit ", f_vis, o1, d1, tm1)
    b = bench_fn("d1 closest tvisit", f_tv, o1, d1, tm1)
    agree(a, b, "d1")
    # occlusion on the same geometry: bounce rays, dist = committed t
    dist = jnp.where(np.asarray(a[0]) < 1e29, a[0] * 1.5,
                     jnp.float32(20.0)) * (tm1 > 0)
    g_vis = jax.jit(lambda o, d, t: vi.any_hit(scene, o, d, t, cfg,
                                               sort=True))
    g_tv = jax.jit(lambda o, d, t: tv.any_hit(scene, o, d, t, cfg,
                                              sort=True))
    oa = bench_fn("d1 occl visit ", g_vis, o1, d1, dist)
    ob = bench_fn("d1 occl tvisit", g_tv, o1, d1, dist)
    print(f"  occl agree {(np.asarray(oa) == np.asarray(ob)).mean():.6f}",
          flush=True)
except FileNotFoundError:
    print("no /tmp/d1_stream.npz — skipping d1 stream", flush=True)

# --- coherent primary chunk (envelope enum) ---
if "--skip-primary" not in sys.argv:
    W, H = 1920, 270
    n = W * H
    perm, _ = _tile_permutation(W, n)
    pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(1920 * 405)
    O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
    tmf = jnp.full(n, 1e30)
    p_vis = jax.jit(lambda o, d, t: vi.closest_hit(
        scene, o, d, cfg, t_max=t, sort=False, coherent=True))
    p_tv = jax.jit(lambda o, d, t: tv.closest_hit(
        scene, o, d, cfg, t_max=t, sort=False, coherent=True))
    a = bench_fn("primary visit ", p_vis, O, D, tmf)
    b = bench_fn("primary tvisit", p_tv, O, D, tmf)
    agree(a, b, "primary")
