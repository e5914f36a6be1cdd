"""Per-stage timing at the bench workload (1080p pica-4x), one 1920x270
chunk exactly like the engine's chunking, real integrator-like ray streams."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, visit_intersect as pi
from rfw_tpu.ops.bsdf.common import safe_origin
from rfw_tpu.render.integrator import _tile_permutation
import bench as benchmod

W, H = 1920, 270
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080); rs.camera.fov = 60.0
rs.synchronize(); eng = rs.context; eng.resize(1920, 1080); eng.update()
scene = eng._scene
tl = scene["treelets"]
n = W * H
view = rs.camera.get_view().as_pytree()
perm, invp = _tile_permutation(W, n)
# middle chunk (rows 405-674): real geometry, not the sky-only top rows
pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(1920 * 405)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
O = jnp.asarray(np.asarray(O)); D = jnp.asarray(np.asarray(D))


def bench_fn(label, fn, *args, reps=3):
    out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return out


ch_nosort = jax.jit(lambda o, d, tm: pi.closest_hit(scene, o, d, cfg,
                                                    t_max=tm, sort=False))
ch_sort = jax.jit(lambda o, d, tm: pi.closest_hit(scene, o, d, cfg,
                                                  t_max=tm, sort=True))
ah_sort = jax.jit(lambda o, d, dist: pi.any_hit(scene, o, d, dist, cfg,
                                                sort=True))
ah_nosort = jax.jit(lambda o, d, dist: pi.any_hit(scene, o, d, dist, cfg,
                                                  sort=False))

tm_full = jnp.full(n, 1e30)
t, prim, u, v = bench_fn("primary closest (tiled, nosort)", ch_nosort,
                         O, D, tm_full)
hit = np.asarray(prim) >= 0
print(f"  hit-rate {hit.mean():.2f}", flush=True)

# depth-0 shadow: fused light+env = 2n rays from hit points (coherent-ish)
hp = O + D * t[:, None]
g = np.random.default_rng(0)
ldir = jnp.asarray(np.tile([[0.26, 0.93, 0.26]], (n, 1)).astype(np.float32))
sdist = jnp.where(jnp.asarray(hit), 20.0, 0.0)
so = safe_origin(hp, -D)
o2 = jnp.concatenate([so, so]); d2 = jnp.concatenate([ldir, ldir])
dist2 = jnp.concatenate([sdist, jnp.where(jnp.asarray(hit), 1e30, 0.0)])
bench_fn("shadow+env any_hit 2n (depth0, nosort)", ah_nosort, o2, d2, dist2)

# bounce: cosine-ish scattered directions from hit points, dead lanes kept
nd = g.normal(size=(n, 3)).astype(np.float32)
nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
Db = jnp.asarray(nd)
tmb = jnp.where(jnp.asarray(hit), 1e30, 0.0)
t2, prim2, _, _ = bench_fn("bounce closest (sorted, dead 45%)", ch_sort,
                           so, Db, tmb)
hit2 = (np.asarray(prim2) >= 0)
print(f"  bounce hit-rate {hit2.mean():.2f} (of all lanes)", flush=True)

# bounce shadow
hp2 = so + Db * t2[:, None]
so2 = safe_origin(hp2, -Db)
sd2 = jnp.where(jnp.asarray(hit2), 20.0, 0.0)
o3 = jnp.concatenate([so2, so2]); d3 = jnp.concatenate([ldir, ldir])
dist3 = jnp.concatenate([sd2, jnp.where(jnp.asarray(hit2), 1e30, 0.0)])
bench_fn("shadow+env any_hit 2n (depth1, sorted)", ah_sort, o3, d3, dist3)

# second bounce
nd2 = g.normal(size=(n, 3)).astype(np.float32)
nd2 /= np.linalg.norm(nd2, axis=-1, keepdims=True)
tmb2 = jnp.where(jnp.asarray(hit2), 1e30, 0.0)
bench_fn("bounce2 closest (sorted, dead 72%)", ch_sort, so2,
         jnp.asarray(nd2), tmb2)

# full engine sample for reference (all 4 chunks + shading)
from rfw_tpu.render import RenderStatus
rs.render_frame(samples=1)
t0 = time.time()
rs.render_frame(status=RenderStatus.CONVERGE, samples=2)
print(f"full engine sample: {(time.time()-t0)/2*1000:.0f} ms "
      f"(x4 chunks + shading)", flush=True)
