"""Two-level acceleration structure: TLAS over instances, BLAS per mesh.

Rebuild of the reference's TopLevelBVH (/root/reference/RFW/system/bvh/...
top_level_bvh.cpp:55-135): per-instance world AABBs feed a top BVH; traversal
transforms the ray into instance space with cached inverse matrices and
descends the mesh's BLAS. Two-level means instances can move with only a
TLAS refit — no triangle re-upload or BLAS rebuild (top_level_bvh.cpp:17-53's
rebuild-vs-refit policy).

The flattened world-space path (render/scene_data.py) remains the engines'
default this round — it rebuilds in ~0.3 s/76k tris with the native
pipeline. This module provides the two-level capability and its oracle
tests; engine integration (object-space shading planes + per-instance
normal transforms in get_shading_data) is the round-2 wiring.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops import traverse
from ..ops.intersect import BIG_T
from .builder import build_bvh, triangle_bounds
from .wide import WideBVH, collapse_wide


@dataclasses.dataclass
class BLAS:
    """Per-mesh bottom-level structure (object space)."""

    wide: WideBVH
    v0: np.ndarray            # (T, 3) permuted
    e1: np.ndarray
    e2: np.ndarray
    prim_order: np.ndarray    # permuted → mesh-local triangle id
    bmin: np.ndarray          # (3,) object-space root bounds
    bmax: np.ndarray


def build_blas(vertices: np.ndarray, leaf_size: int = 4) -> BLAS:
    """vertices: (T, 3, 3) object-space triangles."""
    tmin, tmax = triangle_bounds(vertices)
    bvh = build_bvh(tmin, tmax, leaf_size=leaf_size)
    wide = collapse_wide(bvh)
    perm = vertices[bvh.prim_order]
    return BLAS(
        wide=wide,
        v0=perm[:, 0].copy(),
        e1=(perm[:, 1] - perm[:, 0]).copy(),
        e2=(perm[:, 2] - perm[:, 0]).copy(),
        prim_order=bvh.prim_order,
        bmin=tmin.min(0), bmax=tmax.max(0),
    )


def instance_world_aabb(blas: BLAS, transform: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """World AABB of an instanced BLAS: transform the 8 box corners
    (top_level_bvh.cpp:55-62)."""
    corners = np.array([[x, y, z]
                        for x in (blas.bmin[0], blas.bmax[0])
                        for y in (blas.bmin[1], blas.bmax[1])
                        for z in (blas.bmin[2], blas.bmax[2])], np.float32)
    w = corners @ transform[:3, :3].T + transform[:3, 3]
    return w.min(0).astype(np.float32), w.max(0).astype(np.float32)


@dataclasses.dataclass
class TLAS:
    """Top-level structure over instances.

    Instances referencing the same mesh share one BLAS (the memory/update
    win of two-level — the reference's rfwMesh reuse).
    """

    blas_list: list[BLAS]
    inst_blas: np.ndarray       # (I,) int32 BLAS index per instance
    inst_inv: np.ndarray        # (I, 4, 4) world→object
    inst_bmin: np.ndarray       # (I, 3) world AABBs
    inst_bmax: np.ndarray       # (I, 3)

    def refit(self, transforms: np.ndarray) -> None:
        """Instance matrices changed: recompute world AABBs + inverses only
        (the TLAS refit path — no BLAS work)."""
        for i in range(len(self.inst_blas)):
            m = transforms[i]
            self.inst_inv[i] = np.linalg.inv(m)
            lo, hi = instance_world_aabb(self.blas_list[self.inst_blas[i]], m)
            self.inst_bmin[i], self.inst_bmax[i] = lo, hi


def build_tlas(meshes: list[np.ndarray],
               instances: list[tuple[int, np.ndarray]]) -> TLAS:
    """meshes: list of (T, 3, 3) vertex arrays; instances: (mesh_idx, 4x4)."""
    blas_list = [build_blas(v) for v in meshes]
    n = len(instances)
    inst_blas = np.array([m for m, _ in instances], np.int32)
    inst_inv = np.zeros((n, 4, 4), np.float32)
    inst_bmin = np.zeros((n, 3), np.float32)
    inst_bmax = np.zeros((n, 3), np.float32)
    tl = TLAS(blas_list, inst_blas, inst_inv, inst_bmin, inst_bmax)
    tl.refit(np.stack([t for _, t in instances]))
    return tl


def trace_tlas(tlas: TLAS, origins, directions, t_epsilon: float = 1e-4):
    """Two-level closest hit (jnp).

    Returns (t, instance, prim, u, v) — t in WORLD units (the ray direction
    is transformed unnormalized, so object-space t equals world t —
    top_level_bvh.cpp:104-135's approach). Sequential over instances with a
    vectorized per-ray AABB cull; BLASes run the wide-BVH traversal.
    """
    n_rays = origins.shape[0]
    best_t = jnp.full(n_rays, BIG_T)
    best_inst = jnp.full(n_rays, -1, jnp.int32)
    best_prim = jnp.full(n_rays, -1, jnp.int32)
    best_u = jnp.zeros(n_rays)
    best_v = jnp.zeros(n_rays)

    for i in range(len(tlas.inst_blas)):
        blas = tlas.blas_list[int(tlas.inst_blas[i])]
        inv = jnp.asarray(tlas.inst_inv[i])
        # world AABB cull
        lo = jnp.asarray(tlas.inst_bmin[i])
        hi = jnp.asarray(tlas.inst_bmax[i])
        inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-12, 1e-12,
                                directions)
        t1 = (lo[None] - origins) * inv_d
        t2 = (hi[None] - origins) * inv_d
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit_box = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best_t)

        # transform rays into object space (direction NOT normalized → t
        # stays in world units)
        o_obj = origins @ inv[:3, :3].T + inv[:3, 3]
        d_obj = directions @ inv[:3, :3].T
        wb = {"bmin": jnp.asarray(blas.wide.bmin),
              "bmax": jnp.asarray(blas.wide.bmax),
              "child": jnp.asarray(blas.wide.child),
              "count": jnp.asarray(blas.wide.count)}
        tris = (jnp.asarray(blas.v0), jnp.asarray(blas.e1),
                jnp.asarray(blas.e2))
        t_max_i = jnp.where(hit_box, best_t, 0.0)   # culled lanes trace free
        t_i, prim_i, u_i, v_i = traverse.traverse_wide(
            o_obj, d_obj, wb, tris, leaf_size=4, t_max=t_max_i,
            t_epsilon=t_epsilon)
        better = (prim_i >= 0) & (t_i < best_t)
        best_t = jnp.where(better, t_i, best_t)
        best_inst = jnp.where(better, i, best_inst)
        mesh_prim = jnp.asarray(blas.prim_order)[jnp.maximum(prim_i, 0)]
        best_prim = jnp.where(better, mesh_prim, best_prim)
        best_u = jnp.where(better, u_i, best_u)
        best_v = jnp.where(better, v_i, best_v)

    return best_t, best_inst, best_prim, best_u, best_v
