"""Open up the visit intersector on the REAL depth-1 bounce stream:
how many recull passes run, what the per-block union sizes are, and what
each phase (enum / order / kernel) costs per pass. Decides whether the
~500 ms bounce closest is pass-dominated, sort-dominated or
kernel-dominated."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.ops import visit_intersect as vi  # noqa: E402
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
parts = []
for c in range(4):
    out, _, _, _ = drv._stage(scene, view, drv._slice(state, c),
                              jnp.uint32(0), jnp.int32(0), 0)
    parts.append(out)
state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
state, _ = drv._compact(scene, state)
st1 = jax.tree.map(lambda a: a[:chunk], state)

tl = scene["treelets"]
wg, bounds8, super_g, k_size = vi._granularity(tl, cfg)
print(f"granules T={bounds8.shape[1]} super_g={super_g} K={k_size}",
      flush=True)
lo = tl["scene_lo"] if "scene_lo" in tl else tl["bmin"].min(axis=0)
hi = tl["scene_hi"] if "scene_hi" in tl else tl["bmax"].max(axis=0)
diag = jnp.sqrt(jnp.sum((hi - lo) ** 2))

tm = jnp.where(st1.alive, jnp.float32(1e30), 0.0)
o, d, tmax, r = vi._pad_rays(st1.origin, st1.direction, tm)
rays8 = jax.jit(vi._pack_rays8)(o, d, tmax)

# ---- union-size distribution (pass 1, untightened horizon) ------------
b_entry = vi.block_entries(rays8, bounds8)
crossed = np.asarray(jnp.sum(b_entry < vi.BIG_T, axis=1))
print(f"blocks {crossed.shape[0]}: union size mean {crossed.mean():.0f} "
      f"p50 {np.percentile(crossed, 50):.0f} "
      f"p90 {np.percentile(crossed, 90):.0f} "
      f"p99 {np.percentile(crossed, 99):.0f} max {crossed.max()}; "
      f"overflow(>{vi.M_C}) {(crossed > vi.M_C).mean():.2f}", flush=True)


def bench_fn(label, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time() - t0) / reps * 1000:.1f} ms", flush=True)
    return out


# ---- per-phase costs (pass-1 shapes) ----------------------------------
bench_fn("phase enum (block_entries)", vi.block_entries, rays8, bounds8)
wm0 = jnp.zeros(b_entry.shape[0], jnp.float32)
order_j = jax.jit(lambda be, wm: vi.order_candidates(be, wm, diag, vi.M_C))
ids, counts, overflow, tnears, keys = bench_fn(
    "phase order (row sort)", order_j, b_entry, wm0)
kern_j = jax.jit(lambda r8, i, c, tn: vi._run_visit_kernel(
    r8, i, c, tn, wg, super_g, k_size, float(cfg.t_epsilon), False))
bench_fn("phase kernel (pass 1)", kern_j, rays8, ids, counts, tnears)

# ---- pass count / live blocks per pass (host-stepped _trace) ----------
nb = rays8.shape[0] // 8
t_best = jnp.broadcast_to(tmax, (o.shape[0],))
best_t = t_best
best_slot = jnp.full(o.shape[0], -1, jnp.int32)
finished = tmax <= 0
wm = jnp.zeros(nb, jnp.float32)
for it in range(16):   # diagnostic pass cap (was vi.MAX_PASSES)
    t_hi = jnp.minimum(tmax, best_t)
    t_hi = jnp.where(finished, 0.0, t_hi)
    r8 = vi._pack_rays8(o, d, t_hi)
    be = vi.block_entries(r8, bounds8)
    ids, counts, overflow, tnears, keys = order_j(be, wm)
    t_row, s_row = kern_j(r8, ids, counts, tnears)
    better = (s_row >= 0) & (t_row < jnp.minimum(best_t, tmax))
    best_t = jnp.where(better, t_row, best_t)
    best_slot = jnp.where(better, s_row, best_slot)
    blk_of = jnp.repeat(overflow, vi.BLOCK)[:o.shape[0]]
    finished = finished | ~blk_of
    wm = jnp.where(overflow, keys[:, -1] + 1.0, vi._BIGKEY)
    n_over = int(jnp.sum(overflow))
    print(f"pass {it}: overflowed blocks {n_over}/{nb} "
          f"({float(jnp.sum(counts)) / nb:.0f} visits/blk avg)", flush=True)
    if n_over == 0:
        break
