"""Standalone TPU smoke/bench for the Pallas treelet intersector.

Usage: python tools/pallas_smoke.py [n_tris] [n_rays]
Compares closest/any-hit against the brute-force oracle on random geometry.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.bvh import build_bvh, triangle_bounds, extract_treelets
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import visit_intersect as pi
from rfw_tpu.ops import traverse
from rfw_tpu.ops.intersect import woop_matrices


def build_scene(verts):
    n = verts.shape[0]
    tmin, tmax = triangle_bounds(verts)
    bvh = build_bvh(tmin, tmax, leaf_size=4)
    tl = extract_treelets(bvh, tmin, tmax, size=128)
    pad_valid = tl.pad_map >= 0
    inv_perm = np.empty_like(bvh.prim_order)
    inv_perm[bvh.prim_order] = np.arange(n, dtype=np.int32)
    pad_perm = np.where(pad_valid, inv_perm[np.maximum(tl.pad_map, 0)],
                        -1).astype(np.int32)
    padded_verts = np.zeros((len(tl.pad_map), 3, 3), np.float32)
    padded_verts[pad_valid] = verts[tl.pad_map[pad_valid]]
    w = woop_matrices(padded_verts[:, 0], padded_verts[:, 1],
                      padded_verts[:, 2])
    from rfw_tpu.render.scene_data import _woop_planes
    scene = {"treelets": {
        "woop": w,
        "wplanes": _woop_planes(w, 128),
        "verts": padded_verts, "slot_to_prim": pad_perm,
        "bmin": tl.bmin, "bmax": tl.bmax, "count": tl.count, "size": 128,
    }}
    return jax.tree.map(jnp.asarray, scene), bvh


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = RenderConfig()
    rng = np.random.default_rng(0)
    v0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    verts = np.stack([
        v0, v0 + rng.uniform(-.6, .6, (n, 3)).astype(np.float32),
        v0 + rng.uniform(-.6, .6, (n, 3)).astype(np.float32)], 1)
    scene, bvh = build_scene(verts)
    print("treelets:", scene["treelets"]["bmin"].shape[0], flush=True)

    o = jnp.asarray(rng.uniform(-8, 8, (r, 3)).astype(np.float32))
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    ch = jax.jit(lambda o, d: pi.closest_hit(scene, o, d, cfg))
    ah = jax.jit(lambda o, d, dist: pi.any_hit(scene, o, d, dist, cfg))
    t0 = time.time()
    t, prim, u, v = ch(o, d)
    t.block_until_ready()
    print("pallas closest compile+run %.1fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    for _ in range(5):
        t, prim, u, v = ch(o, d)
    t.block_until_ready()
    dt = (time.time() - t0) / 5
    print("pallas closest run %.4fs -> %.1f Mrays/s" % (dt, r / dt / 1e6),
          flush=True)

    perm = verts[bvh.prim_order]
    tris = (jnp.asarray(perm[:, 0]), jnp.asarray(perm[:, 1] - perm[:, 0]),
            jnp.asarray(perm[:, 2] - perm[:, 0]))
    bf = jax.jit(lambda o, d: traverse.brute_force_closest(o, d, tris))
    t_ref, prim_ref, _, _ = bf(o, d)
    t_ref, prim_ref = np.asarray(t_ref), np.asarray(prim_ref)
    t_np, prim_np = np.asarray(t), np.asarray(prim)
    hit_p, hit_r = prim_np >= 0, prim_ref >= 0
    print("hit agreement:", (hit_p == hit_r).mean(), flush=True)
    both = hit_p & hit_r
    print("prim agreement:", (prim_np[both] == prim_ref[both]).mean(),
          flush=True)
    print("t max abs err:", float(np.abs(t_np[both] - t_ref[both]).max()),
          flush=True)

    dist1 = jnp.asarray(np.where(hit_r, t_ref * 0.99, 1e30).astype(np.float32))
    occ = np.asarray(ah(o, d, dist1))
    print("occluded at 0.99t (want 0):", occ[hit_r].mean(), flush=True)
    dist2 = jnp.asarray(np.where(hit_r, t_ref * 1.01, 1e30).astype(np.float32))
    occ2 = np.asarray(ah(o, d, dist2))
    print("occluded at 1.01t (want 1):", occ2[hit_r].mean(), flush=True)


if __name__ == "__main__":
    main()
