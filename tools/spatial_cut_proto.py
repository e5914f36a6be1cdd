"""Prototype: centroid-median kd cells (no duplication, tight bounds) vs the
current SAH-subtree treelets. Measures per-ray crossings/entered-before-hit
on pica-4x primaries AND scattered bounce rays — the decision data for a
spatial extract_treelets. CPU-only.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen
import bench as benchmod


def centroid_cells(tmin, tmax, k_max, big_frac=0.05):
    """Median-split triangle CENTROIDS into cells of <= k_max members; cell
    bounds are the tight AABB over member triangle AABBs. Triangles larger
    than big_frac of the scene extent go to a separate 'global' list.
    Returns (cells: list[idx array], big_idx)."""
    ext = tmax - tmin
    scene_lo = tmin.min(0); scene_hi = tmax.max(0)
    big = ext.max(1) > big_frac * (scene_hi - scene_lo).max()
    big_idx = np.where(big)[0]
    idx0 = np.where(~big)[0]
    c = 0.5 * (tmin + tmax)
    cells = []
    stack = [idx0]
    while stack:
        idx = stack.pop()
        if len(idx) <= k_max:
            cells.append(idx)
            continue
        cc = c[idx]
        ax = int(np.argmax(cc.max(0) - cc.min(0)))
        med = np.argsort(cc[:, ax], kind="stable")
        half = len(idx) // 2
        stack.append(idx[med[:half]])
        stack.append(idx[med[half:]])
    return cells, big_idx


def crossings(o, d, t_hit, lo_arr, hi_arr, chunk=256):
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    n = len(o)
    tot = np.zeros(n, np.int32)
    pre = np.zeros(n, np.int32)
    for s in range(0, len(lo_arr), chunk):
        lo = lo_arr[s:s+chunk]; hi = hi_arr[s:s+chunk]
        t1 = (lo[None] - o[:, None]) * inv[:, None]
        t2 = (hi[None] - o[:, None]) * inv[:, None]
        tmn = np.minimum(t1, t2).max(-1)
        tmx = np.maximum(t1, t2).min(-1)
        hit = tmx >= np.maximum(tmn, 0.0)
        tot += hit.sum(-1).astype(np.int32)
        pre += (hit & (tmn < t_hit[:, None])).sum(-1).astype(np.int32)
    return tot, pre


rs = RenderSystem("megakernel", RenderConfig())
benchmod.build_scene(rs)
size = 128
rs.camera.resize(size, size); rs.camera.fov = 60.0
rs.synchronize(); eng = rs.context; eng.resize(size, size); eng.update()
scene = eng._scene
V = np.asarray(scene["tri_vertices"])
tmin = V.min(1) - 1e-6; tmax = V.max(1) + 1e-6
T = len(V)

view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, size, size, 0)
O = np.asarray(O); D = np.asarray(D)

from rfw_tpu.ops import traverse
tris = (scene["tri_vertices"][:, 0],
        scene["tri_vertices"][:, 1] - scene["tri_vertices"][:, 0],
        scene["tri_vertices"][:, 2] - scene["tri_vertices"][:, 0])
trav = jax.jit(lambda o, d: traverse.traverse_wide(
    o, d, scene["bvh"], tris, leaf_size=4))
t, prim, _, _ = trav(jnp.asarray(O), jnp.asarray(D))
t = np.asarray(t); prim = np.asarray(prim)
t_hit = np.where(prim >= 0, t, 1e30)
hitm = prim >= 0
print(f"tris {T} hit-rate {hitm.mean():.2f}", flush=True)

# bounce rays from primary hits
P = (O + D * np.where(hitm, t, 0)[:, None])[hitm]
g = np.random.default_rng(0)
nd = g.normal(size=P.shape).astype(np.float32)
nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
tb, primb, _, _ = trav(jnp.asarray(P), jnp.asarray(nd))
tb = np.asarray(tb); primb = np.asarray(primb)
tb_hit = np.where(primb >= 0, tb, 1e30)

tl = scene["treelets"]
clo = np.asarray(tl["bmin"]); chi = np.asarray(tl["bmax"])
K0 = int(tl["size"])
tot, pre = crossings(O, D, t_hit, clo, chi)
totb, preb = crossings(P, nd, tb_hit, clo, chi)
print(f"CURRENT n={len(clo)} K={K0}: prim pre-hit {pre.mean():.1f} "
      f"(tests/ray {pre.mean()*K0:.0f}) | bounce pre-hit {preb.mean():.1f} "
      f"(tests/ray {preb.mean()*K0:.0f})", flush=True)

for K in (256, 128, 64):
    t0 = time.time()
    cells, big_idx = centroid_cells(tmin, tmax, K)
    dt = time.time() - t0
    lo_arr = np.stack([tmin[c].min(0) for c in cells])
    hi_arr = np.stack([tmax[c].max(0) for c in cells])
    occ = np.array([len(c) for c in cells])
    tot, pre = crossings(O, D, t_hit, lo_arr, hi_arr)
    totb, preb = crossings(P, nd, tb_hit, lo_arr, hi_arr)
    big_tests = len(big_idx)  # global set: tested once per ray
    pr_tests = pre.mean() * K + big_tests
    bo_tests = preb.mean() * K + big_tests
    print(f"SPATIAL K={K}: cells {len(cells)} big {len(big_idx)} occ-mean "
          f"{occ.mean():.0f} | prim: cross {tot.mean():.1f} pre-hit "
          f"{pre.mean():.1f} p90 {np.percentile(pre,90):.0f} tests/ray "
          f"{pr_tests:.0f} | bounce: cross {totb.mean():.1f} pre-hit "
          f"{preb.mean():.1f} tests/ray {bo_tests:.0f} | cut {dt:.1f}s",
          flush=True)

# variant: big tris get their OWN centroid cells (looser bounds, few cells)
print("--- big-tri handling variants (K=128 base cells) ---", flush=True)
cells, big_idx = centroid_cells(tmin, tmax, 128)
for bk in (64, 32):
    bcells, _ = centroid_cells(tmin[big_idx], tmax[big_idx], bk,
                               big_frac=10.0)
    bcells = [big_idx[c] for c in bcells]
    blo = np.stack([tmin[c].min(0) for c in bcells])
    bhi = np.stack([tmax[c].max(0) for c in bcells])
    tot, pre = crossings(O, D, t_hit, blo, bhi)
    totb, preb = crossings(P, nd, tb_hit, blo, bhi)
    print(f"  big-cells K={bk}: n={len(bcells)} | prim pre-hit "
          f"{pre.mean():.1f}/{len(bcells)} tests {pre.mean()*bk:.0f} | "
          f"bounce pre-hit {preb.mean():.1f} tests {preb.mean()*bk:.0f}",
          flush=True)

# variant: no big split — everything in centroid cells
for K in (128,):
    cells_all, _ = centroid_cells(tmin, tmax, K, big_frac=10.0)
    lo_arr = np.stack([tmin[c].min(0) for c in cells_all])
    hi_arr = np.stack([tmax[c].max(0) for c in cells_all])
    tot, pre = crossings(O, D, t_hit, lo_arr, hi_arr)
    totb, preb = crossings(P, nd, tb_hit, lo_arr, hi_arr)
    print(f"  no-big-split K={K}: cells {len(cells_all)} | prim cross "
          f"{tot.mean():.1f} pre-hit {pre.mean():.1f} tests "
          f"{pre.mean()*K:.0f} | bounce pre-hit {preb.mean():.1f} tests "
          f"{preb.mean()*K:.0f}", flush=True)
