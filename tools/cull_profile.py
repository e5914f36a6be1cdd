"""Time each piece of the closest_hit XLA wrapper at bench-chunk scale."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi
from rfw_tpu.ops.compaction import ray_sort_keys
import bench as benchmod

cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080); rs.camera.fov = 60.0
rs.synchronize(); eng = rs.context; eng.resize(1920, 1080); eng.update()
scene = eng._scene
tl = scene["treelets"]
n = 1920 * 270
view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0)
O = jnp.asarray(np.asarray(O))[:n]; D = jnp.asarray(np.asarray(D))[:n]
tm = jnp.full(n, 1e30)


def bench_fn(label, fn, *args, reps=5):
    out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


lo, hi = tl["scene_lo"], tl["scene_hi"]
keys = bench_fn("1 sort keys", jax.jit(
    lambda o, d: ray_sort_keys(o, d, lo, hi)), O, D)
order = bench_fn("2 argsort keys", jax.jit(
    lambda k: jnp.argsort(k).astype(jnp.int32)), keys)
bench_fn("3 inv via argsort", jax.jit(
    lambda o: jnp.argsort(o).astype(jnp.int32)), order)
bench_fn("3b inv via scatter", jax.jit(
    lambda o: jnp.zeros(n, jnp.int32).at[o].set(
        jnp.arange(n, dtype=jnp.int32))), order)
bench_fn("4 gather o/d/tm", jax.jit(
    lambda o, d, t, idx: (o[idx], d[idx], t[idx])), O, D, tm, order)

ts = tl["sbmin"].shape[0]


def slab_only(o, d, t):
    # replicate build_super_candidates up to tn (no top_k)
    nb = o.shape[0] // pi.BLOCK
    big = jnp.float32(3e38)
    ob = o.reshape(nb, pi.BLOCK, 3); db = d.reshape(nb, pi.BLOCK, 3)
    tmb = t.reshape(nb, pi.BLOCK)
    alive = (tmb > 0)[..., None]
    o_lo = jnp.min(jnp.where(alive, ob, big), axis=1)
    o_hi = jnp.max(jnp.where(alive, ob, -big), axis=1)
    d_lo = jnp.min(jnp.where(alive, db, big), axis=1)
    d_hi = jnp.max(jnp.where(alive, db, -big), axis=1)
    dpos = d_lo >= 0
    co_hi = jnp.where(dpos, o_hi, -o_lo)
    da_lo = jnp.maximum(jnp.where(dpos, d_lo, -d_hi), 1e-12)
    da_hi = jnp.maximum(jnp.where(dpos, d_hi, -d_lo), da_lo)
    i_lo = 1.0 / da_hi; i_hi = 1.0 / da_lo
    blo = jnp.where(dpos[:, None, :], tl["sbmin"][None], -tl["sbmax"][None])
    a_lo = blo - co_hi[:, None, :]
    e_lb = a_lo * jnp.where(a_lo >= 0, i_lo[:, None, :], i_hi[:, None, :])
    return jnp.max(e_lb, axis=-1)


tn = bench_fn("5 super slab (approx)", jax.jit(slab_only), O, D, tm)
bench_fn("6 top_k 128 of 512", jax.jit(
    lambda x: jax.lax.top_k(-x, 128)), tn)
bench_fn("6b full sort 512", jax.jit(
    lambda x: jnp.sort(x, axis=-1)), tn)
bench_fn("6c argsort 512 rows", jax.jit(
    lambda x: jnp.argsort(x, axis=-1)), tn)
bench_fn("7 full cull e2e", jax.jit(
    lambda o, d, t: pi.build_super_candidates(
        o, d, t, tl["sbmin"], tl["sbmax"], tl["bmin"], tl["bmax"])),
    O, D, tm)
ids, counts, ov, tnears = pi.build_super_candidates(
    O, D, tm, tl["sbmin"], tl["sbmax"], tl["bmin"], tl["bmax"])
rays = pi._pack_rays(O, D, tm)
bench_fn("8 pack rays", jax.jit(pi._pack_rays), O, D, tm)
bench_fn("9 kernel only", jax.jit(
    lambda r, i, c, o2, t2: pi._run_kernel(
        r, i, c, o2, t2, pi._wsup(tl), ts, int(tl["size"]), 1e-4, False)),
    rays, ids, counts, ov.astype(jnp.int32), tnears)
# MT refine + slot maps
t_, slot, _ = pi._run_kernel(rays, ids, counts, ov.astype(jnp.int32),
                             tnears, pi._wsup(tl), ts, int(tl["size"]),
                             1e-4, False)
from rfw_tpu.ops.intersect import intersect_tri
def refine(slot, t):
    tv = tl["verts"][jnp.maximum(slot, 0)]
    return intersect_tri(O, D, tv[:, 0], tv[:, 1]-tv[:, 0], tv[:, 2]-tv[:, 0],
                         t_epsilon=5e-5)
bench_fn("10 MT winner refine", jax.jit(refine), slot, t_)
