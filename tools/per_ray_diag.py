"""Per-RAY candidate treelet counts on pica-4x bounce rays.

The dense block kernel pays the per-block candidate UNION; a pair-expansion
kernel would pay the per-ray SUM. This measures both, plus the effect of a
perfect per-ray t bound (what a two-phase recull can approach), to size the
win before building the pair path.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pallas_intersect as pi
from rfw_tpu.ops.compaction import ray_sort_keys
import bench as benchmod

size = 512
rs = RenderSystem("wavefront", RenderConfig())
benchmod.build_scene(rs)
rs.camera.resize(size, size); rs.camera.fov = 60.0
rs.synchronize(); eng = rs.context; eng.resize(size, size); eng.update()
scene = eng._scene
tl = scene["treelets"]
T = int(np.asarray(tl["bmin"]).shape[0])
K = int(tl["wplanes"].shape[2])
view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, size, size, 0)
O = jnp.asarray(np.asarray(O)); D = jnp.asarray(np.asarray(D))
cfg = RenderConfig()
print(f"treelets {T} k_size {K}", flush=True)


def per_ray_counts(o, d, tm):
    """Exact per-ray candidate counts + per-block union (256-ray blocks)."""
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d < 0, -1e-12, 1e-12), d)
    chunk = 64
    t_pad = -(-T // chunk) * chunk
    blo = jnp.pad(tl["bmin"], ((0, t_pad - T), (0, 0)), constant_values=3e38)
    bhi = jnp.pad(tl["bmax"], ((0, t_pad - T), (0, 0)), constant_values=-3e38)
    blo = blo.reshape(-1, chunk, 3); bhi = bhi.reshape(-1, chunk, 3)

    def chunk_fn(bounds):
        lo, hi = bounds
        t1 = (lo[None] - o[:, None]) * inv_d[:, None]
        t2 = (hi[None] - o[:, None]) * inv_d[:, None]
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < tm[:, None])
        return hit

    hits = jax.lax.map(chunk_fn, (blo, bhi))          # (nc, R, chunk)
    hits = jnp.moveaxis(hits, 0, 1).reshape(o.shape[0], t_pad)[:, :T]
    per_ray = hits.sum(-1).astype(jnp.int32)
    nb = o.shape[0] // 256
    union = hits.reshape(nb, 256, T).any(1).sum(-1).astype(jnp.int32)
    return per_ray, union


prc = jax.jit(per_ray_counts)

# --- primaries ---
tm_inf = jnp.full(O.shape[0], 1e30)
ch = jax.jit(lambda o, d, tm: pi.closest_hit(scene, o, d, cfg, t_max=tm))
t, prim, _, _ = ch(O, D, tm_inf)
pr, un = prc(O, D, tm_inf)
pr = np.asarray(pr); un = np.asarray(un)
print(f"PRIMARY unbounded: per-ray mean {pr.mean():.1f} p90 {np.percentile(pr,90):.0f} | block-union mean {un.mean():.1f}", flush=True)
tmb = jnp.where(prim >= 0, t * 1.0001, tm_inf)
pr, un = prc(O, D, tmb)
pr = np.asarray(pr); un = np.asarray(un)
print(f"PRIMARY perfect-bound: per-ray mean {pr.mean():.1f} p90 {np.percentile(pr,90):.0f} | block-union mean {un.mean():.1f}", flush=True)

# --- bounce rays: cosine hemisphere around true shading normal proxy ---
hitm = np.asarray(prim) >= 0
P = np.asarray(O + D * t[:, None])[hitm]
g = np.random.default_rng(0)
nd = g.normal(size=P.shape).astype(np.float32)
nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
n_rays = (len(P) // 256) * 256
P, nd = P[:n_rays], nd[:n_rays]

lo = np.asarray(tl["bmin"]).min(0); hi = np.asarray(tl["bmax"]).max(0)
keys = np.asarray(ray_sort_keys(jnp.asarray(P), jnp.asarray(nd),
                                jnp.asarray(lo), jnp.asarray(hi)))
order = np.argsort(keys)
Ps, Ds = jnp.asarray(P[order]), jnp.asarray(nd[order])
tm_inf_b = jnp.full(n_rays, 1e30)

tb, primb, _, _ = ch(Ps, Ds, tm_inf_b)
pr, un = prc(Ps, Ds, tm_inf_b)
pr = np.asarray(pr); un = np.asarray(un)
print(f"BOUNCE sorted unbounded: per-ray mean {pr.mean():.1f} p50 {np.percentile(pr,50):.0f} p90 {np.percentile(pr,90):.0f} max {pr.max()} | union mean {un.mean():.1f} p90 {np.percentile(un,90):.0f}", flush=True)
tmbb = jnp.where(primb >= 0, tb * 1.0001, tm_inf_b)
pr2, un2 = prc(Ps, Ds, tmbb)
pr2 = np.asarray(pr2); un2 = np.asarray(un2)
hb = np.asarray(primb) >= 0
print(f"BOUNCE perfect-bound: per-ray mean {pr2.mean():.1f} p50 {np.percentile(pr2,50):.0f} p90 {np.percentile(pr2,90):.0f} | union mean {un2.mean():.1f} (hit-rate {hb.mean():.2f})", flush=True)
print(f"BOUNCE perfect-bound hit-rays only: per-ray mean {pr2[hb].mean():.1f} p90 {np.percentile(pr2[hb],90):.0f}", flush=True)

# pair-work comparison: dense kernel pays union*256 per block; pair kernel
# pays sum(per_ray) padded to segments
dense_pairs = un2.sum() * 256
pair_pairs = pr2.sum()
print(f"pair-work ratio (dense/union vs per-ray-sum): {dense_pairs/max(pair_pairs,1):.1f}x", flush=True)
