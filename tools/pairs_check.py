"""Parity check: pair-expansion intersector vs brute force (CPU interpret).

Random triangle soup + random rays (mixed coherent/scattered, dead lanes),
closest and any-hit. Run on CPU (interpret) or TPU (real kernel).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("RFW_CPU", "1") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp

from rfw_tpu.config import RenderConfig
from rfw_tpu.render import scene_data
from rfw_tpu.scene.mesh import TriangleSoA
from rfw_tpu.ops import pair_intersect, traverse
from rfw_tpu.ops.intersect import BIG_T

rng = np.random.default_rng(7)
NT = int(os.environ.get("NT", "3000"))
NR = int(os.environ.get("NR", "4096"))

# triangle soup clustered into blobs (some BVH structure)
centers = rng.uniform(-10, 10, (32, 3))
tri_c = centers[rng.integers(0, 32, NT)] + rng.normal(0, 1.2, (NT, 3))
verts = (tri_c[:, None, :] + rng.normal(0, 0.35, (NT, 3, 3))).astype(
    np.float32)

from rfw_tpu.scene.mesh import build_triangles
soa = build_triangles(verts.reshape(-1, 3),
                      np.arange(NT * 3).reshape(NT, 3))
inst = scene_data.InstancedMesh(
    triangles=soa, transform=np.eye(4, dtype=np.float32),
    instance_id=0, mesh_slot=0)
from rfw_tpu.scene.materials import MaterialList
from rfw_tpu.scene.lights import pack_lights
cfg = RenderConfig()
scene = scene_data.build_device_scene(
    [inst], MaterialList().generate_device_materials(),
    pack_lights([], [], [], []), None, None, cfg)
scene.pop("_bvh_host")
scene = jax.tree.map(lambda x: jnp.asarray(x)
                     if isinstance(x, np.ndarray) else x, scene)

O = rng.uniform(-14, 14, (NR, 3)).astype(np.float32)
D = rng.normal(size=(NR, 3)).astype(np.float32)
D /= np.linalg.norm(D, axis=-1, keepdims=True)
tm = np.full(NR, 1e30, np.float32)
tm[rng.random(NR) < 0.3] = 0.0        # dead lanes
O, D, tm = jnp.asarray(O), jnp.asarray(D), jnp.asarray(tm)

t0 = time.time()
t_p, prim_p, u_p, v_p = pair_intersect.closest_hit(scene, O, D, cfg,
                                                   t_max=tm)
t_p.block_until_ready()
print(f"pairs closest: {time.time()-t0:.1f}s (compile+run)")

tris = (scene["tri_vertices"][:, 0],
        scene["tri_vertices"][:, 1] - scene["tri_vertices"][:, 0],
        scene["tri_vertices"][:, 2] - scene["tri_vertices"][:, 0])
t_b, prim_b, u_b, v_b = traverse.brute_force_closest(O, D, tris,
                                                     t_epsilon=cfg.t_epsilon)
prim_b = jnp.where((t_b < tm) & (prim_b >= 0), prim_b, -1)
t_b = jnp.where(prim_b >= 0, t_b, BIG_T)

t_p, prim_p = np.asarray(t_p), np.asarray(prim_p)
t_b, prim_b = np.asarray(t_b), np.asarray(prim_b)
hit_match = (prim_p >= 0) == (prim_b >= 0)
print(f"hit agreement: {hit_match.mean():.4f}")
both = (prim_p >= 0) & (prim_b >= 0)
terr = np.abs(t_p[both] - t_b[both]) / np.maximum(t_b[both], 1e-6)
print(f"t err max {terr.max() if both.any() else 0:.2e}; "
      f"prim agree {(prim_p[both] == prim_b[both]).mean():.4f}")
bad = np.where(~hit_match)[0]
if len(bad):
    print("MISMATCH rays:", bad[:10], "pair prim", prim_p[bad[:10]],
          "brute prim", prim_b[bad[:10]], "tm", np.asarray(tm)[bad[:10]])

# any-hit
dist = np.full(NR, 6.0, np.float32)
dist[rng.random(NR) < 0.3] = 0.0
dist = jnp.asarray(dist)
occ_p = np.asarray(pair_intersect.any_hit(scene, O, D, dist, cfg))
occ_b = np.asarray((prim_b >= 0) & (t_b < np.asarray(dist)))
# brute any-hit oracle: recompute against dist
t_b2, prim_b2, _, _ = traverse.brute_force_closest(O, D, tris,
                                                   t_epsilon=cfg.t_epsilon)
occ_b = np.asarray((prim_b2 >= 0) & (np.asarray(t_b2) < np.asarray(dist)))
print(f"any-hit agreement: {(occ_p == occ_b).mean():.4f}")
assert hit_match.all() and (occ_p == occ_b).all() and \
    (prim_p[both] == prim_b[both]).mean() > 0.999, "PARITY FAILURE"
print("OK")
