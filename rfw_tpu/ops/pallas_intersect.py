"""Pallas/TPU treelet intersection kernels — the flagship fast path.

TPU-native replacement for the reference's SIMD/SIMT BVH traversal
(/root/reference/RFW/system/bvh/.../mbvh_node.h:122-307 and the CUDA MBVH
walker, CUDART/src/CUDAIntersect.h): instead of per-ray pointer chasing —
which a lockstep VPU cannot do efficiently — rays are processed in blocks of
``BLOCK`` and triangles in *treelets* of ``K`` (contiguous SAH-subtree
ranges, bvh/wide.py):

1. **Cull (XLA, dense):** per ray-block, a conservative ray-envelope vs
   treelet-AABB overlap test selects candidate treelets, ordered
   near-to-far via top-k. Overflowing blocks (incoherent rays) fall back to
   visiting every treelet — correct, just slower.
2. **Intersect (Pallas):** per block, the kernel walks its candidate list
   (scalar-prefetched), DMAs each treelet's Woop planes HBM→VMEM double-
   buffered, and intersects all BLOCK×K pairs densely: the world→unit-
   triangle transform is three ``[2·BLOCK, 4] @ [4, K]`` matmuls on the MXU
   (ops/intersect.py woop_matrices), followed by ~12 VPU flops per pair and
   a cross-lane argmin. No gathers, no divergence, static shapes.

Precision: the kernel returns (t, slot); callers refine the winning
triangle with one Möller–Trumbore step (see closest_hit_woop) to remove the
f32 cancellation of the dense form.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .intersect import BIG_T, intersect_tri

BLOCK = 128          # rays per block (grid dim)
M_MAX = 128          # candidate treelets per block before full-scan fallback


# ---------------------------------------------------------------------------
# Phase 1: candidate selection (XLA)
# ---------------------------------------------------------------------------

def build_candidates(origins, directions, t_far, bmin, bmax, m_max=M_MAX):
    """Per-block candidate treelets.

    origins/directions: (R, 3) with R % BLOCK == 0; t_far: scalar conservative
    ray length bound; bmin/bmax: (T, 3) treelet AABBs.

    Returns (ids (NB, m_max) i32, counts (NB,) i32, overflow (NB,) bool).
    ids are sorted near-to-far by treelet-center distance to the block's
    origin centroid.
    """
    nb = origins.shape[0] // BLOCK
    o = origins.reshape(nb, BLOCK, 3)
    d = directions.reshape(nb, BLOCK, 3)
    olo = o.min(axis=1)
    ohi = o.max(axis=1)
    dlo = d.min(axis=1)
    dhi = d.max(axis=1)
    env_lo = olo + t_far * jnp.minimum(dlo, 0.0)
    env_hi = ohi + t_far * jnp.maximum(dhi, 0.0)
    overlap = jnp.all(
        (env_lo[:, None, :] <= bmax[None, :, :])
        & (env_hi[:, None, :] >= bmin[None, :, :]), axis=-1)   # (NB, T)

    center = 0.5 * (bmin + bmax)                                # (T, 3)
    oc = 0.5 * (olo + ohi)                                      # (NB, 3)
    dist = jnp.sum((center[None, :, :] - oc[:, None, :]) ** 2, axis=-1)
    key = jnp.where(overlap, -dist, -jnp.inf)                   # top_k: near first
    k = min(m_max, bmin.shape[0])
    _, ids = jax.lax.top_k(key, k)                              # (NB, k)
    counts = jnp.sum(overlap, axis=-1).astype(jnp.int32)
    overflow = counts > k
    if k < m_max:
        ids = jnp.pad(ids, ((0, 0), (0, m_max - k)))
    return ids.astype(jnp.int32), jnp.minimum(counts, k), overflow


# ---------------------------------------------------------------------------
# Phase 2: the kernel
# ---------------------------------------------------------------------------

def _intersect_kernel(n_treelets: int, k_size: int, t_epsilon: float,
                      any_hit: bool,
                      # prefetched scalars
                      ids_ref, counts_ref, overflow_ref,
                      # inputs
                      rays_ref,              # (8, BLOCK): ox,oy,oz,tmax, dx,dy,dz,0
                      wplanes_hbm,           # (T, 16, K): woop rows u0..3,v0..3,w0..3,pad
                      # outputs
                      t_out, slot_out,
                      # scratch
                      wp_s, sems):
    b = pl.program_id(0)
    count = counts_ref[b]
    full = overflow_ref[b] != 0
    n_visits = jnp.where(full, n_treelets, count)

    rays = rays_ref[:]                       # (8, BLOCK)
    t_max0 = rays[3:4, :].T                  # (BLOCK, 1)
    # caller packs tmax into row 3; rebuild homogeneous rows: o row 3 = 1,
    # d row 3 = 0
    ones = jnp.ones((1, BLOCK), jnp.float32)
    zeros = jnp.zeros((1, BLOCK), jnp.float32)
    o4h = jnp.concatenate([rays[0:3, :], ones], axis=0)    # (4, BLOCK)
    d4h = jnp.concatenate([rays[4:7, :], zeros], axis=0)

    def treelet_id(i):
        return jnp.where(full, i, ids_ref[b, jnp.minimum(i, M_MAX - 1)])

    def dma(slot, tid):
        return pltpu.make_async_copy(
            wplanes_hbm.at[tid], wp_s.at[slot], sems.at[slot])

    @pl.when(n_visits > 0)
    def _():
        dma(0, treelet_id(0)).start()

    def body(i, carry):
        best_t, best_slot = carry
        slot = jnp.remainder(i, 2)
        nxt = jnp.remainder(i + 1, 2)

        @pl.when(i + 1 < n_visits)
        def _():
            dma(nxt, treelet_id(i + 1)).start()

        dma(slot, treelet_id(i)).wait()

        wp = wp_s[slot]                       # (16, K)
        wu = wp[0:4, :]
        wv = wp[4:8, :]
        ww = wp[8:12, :]

        # MXU: transform rays into each triangle's unit frame — contract the
        # component axis of (4, BLOCK) rays with (4, K) woop planes
        def xf(a, w):
            return jax.lax.dot_general(
                a, w, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (BLOCK, K)

        ou, du = xf(o4h, wu), xf(d4h, wu)
        ov, dv = xf(o4h, wv), xf(d4h, wv)
        ow, dw = xf(o4h, ww), xf(d4h, ww)

        valid = jnp.abs(dw) > 1e-12
        t = -ow / jnp.where(valid, dw, 1.0)
        u = ou + t * du
        v = ov + t * dv
        hit = (valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > t_epsilon) & (t < best_t))
        t_hit = jnp.where(hit, t, 1e30)
        tmin = jnp.min(t_hit, axis=1, keepdims=True)        # (BLOCK, 1)
        kbest = jnp.argmin(t_hit, axis=1, keepdims=True).astype(jnp.int32)
        better = tmin < best_t
        tid = treelet_id(i)
        new_slot = jnp.where(better, tid * k_size + kbest, best_slot)
        return jnp.where(better, tmin, best_t), new_slot

    init = (t_max0, jnp.full((BLOCK, 1), -1, jnp.int32))
    if any_hit:
        def cond(state):
            i, (bt, bs) = state
            return (i < n_visits) & jnp.any(bs < 0)

        def wbody(state):
            i, carry = state
            return i + 1, body(i, carry)

        _, (best_t, best_slot) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), init))
    else:
        best_t, best_slot = jax.lax.fori_loop(0, n_visits, body, init)

    # outputs are (1, BLOCK, 8) blocks; column 0 is the payload, the rest
    # padding (Mosaic layout: per-ray state lives as (BLOCK, 1) 2-D vectors)
    t_out[0, :, :] = jnp.broadcast_to(best_t, (BLOCK, 8))
    slot_out[0, :, :] = jnp.broadcast_to(best_slot, (BLOCK, 8))


@functools.partial(jax.jit, static_argnames=("k_size", "t_epsilon",
                                             "any_hit", "n_treelets"))
def _run_kernel(rays, ids, counts, overflow, wplanes,
                n_treelets: int, k_size: int, t_epsilon: float,
                any_hit: bool):
    nb = ids.shape[0]
    rays = rays.reshape(nb * 8, BLOCK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, BLOCK), lambda b, *_: (b, 0),  # rows [8b, 8b+8)
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK, 8), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 8), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, k_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_intersect_kernel, n_treelets, k_size,
                               t_epsilon, any_hit)
    interpret = jax.default_backend() == "cpu"  # CPU: emulate (tests/debug)
    t, slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, BLOCK, 8), jnp.float32),
            jax.ShapeDtypeStruct((nb, BLOCK, 8), jnp.int32),
        ],
    )(ids, counts, overflow, rays, wplanes)
    return t[:, :, 0].reshape(-1), slot[:, :, 0].reshape(-1)


def _pack_rays(origins, directions, t_max):
    """(R, 3)+(R, 3)+(R,) → (NB, 8, BLOCK) rows ox,oy,oz,tmax,dx,dy,dz,0."""
    r = origins.shape[0]
    nb = r // BLOCK
    o = origins.reshape(nb, BLOCK, 3).transpose(0, 2, 1)
    d = directions.reshape(nb, BLOCK, 3).transpose(0, 2, 1)
    tm = t_max.reshape(nb, 1, BLOCK)
    zero = jnp.zeros((nb, 1, BLOCK), jnp.float32)
    return jnp.concatenate([o, tm, d, zero], axis=1)


def _scene_t_far(tl):
    lo = tl["bmin"].min(axis=0)
    hi = tl["bmax"].max(axis=0)
    return jnp.sqrt(jnp.sum((hi - lo) ** 2)) * 2.0 + 1.0


def _pad_rays(origins, directions, t_max):
    r = origins.shape[0]
    pad = (-r) % BLOCK
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.zeros((pad, 3), origins.dtype)])
        directions = jnp.concatenate(
            [directions, jnp.ones((pad, 3), directions.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    return origins, directions, t_max, r


def closest_hit(scene, origins, directions, config: RenderConfig):
    """Intersector ABI: (t, prim, u, v) with prim in permuted order."""
    tl = scene["treelets"]
    k_size = int(tl["size"])
    t_far = _scene_t_far(tl)
    o, d, tm, r = _pad_rays(origins, directions,
                            jnp.full(origins.shape[0], BIG_T))
    ids, counts, overflow = build_candidates(o, d, t_far, tl["bmin"],
                                             tl["bmax"])
    import os as _os
    if _os.environ.get("RFW_PALLAS_FULLSCAN") == "1":  # debug bisect
        overflow = jnp.ones_like(overflow)
    rays = _pack_rays(o, d, tm)
    n_treelets = tl["bmin"].shape[0]
    t, slot = _run_kernel(rays, ids, counts, overflow.astype(jnp.int32),
                          tl["wplanes"],
                          n_treelets, k_size, float(config.t_epsilon), False)
    t, slot = t[:r], slot[:r]
    found = slot >= 0
    prim = jnp.where(found, tl["slot_to_prim"][jnp.maximum(slot, 0)], -1)
    found = found & (prim >= 0)

    # Möller–Trumbore refinement of the winner (precision — see module doc)
    tv = tl["verts"][jnp.maximum(slot, 0)]
    rhit, rt, ru, rv = intersect_tri(
        origins[:r], directions[:r], tv[:, 0], tv[:, 1] - tv[:, 0],
        tv[:, 2] - tv[:, 0], t_epsilon=config.t_epsilon * 0.5)
    t = jnp.where(found & rhit, rt, t)
    u = jnp.where(found & rhit, ru, 0.0)
    v = jnp.where(found & rhit, rv, 0.0)
    return (jnp.where(found, t, BIG_T), jnp.where(found, prim, -1), u, v)


def any_hit(scene, origins, directions, dist, config: RenderConfig):
    """Occlusion test: True where something lies closer than ``dist``."""
    tl = scene["treelets"]
    k_size = int(tl["size"])
    t_far = _scene_t_far(tl)
    o, d, tm, r = _pad_rays(origins, directions, dist)
    ids, counts, overflow = build_candidates(o, d, t_far, tl["bmin"],
                                             tl["bmax"])
    rays = _pack_rays(o, d, tm)
    n_treelets = tl["bmin"].shape[0]
    _, slot = _run_kernel(rays, ids, counts, overflow.astype(jnp.int32),
                          tl["wplanes"],
                          n_treelets, k_size, float(config.t_epsilon), True)
    return slot[:r] >= 0
