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
   (SMEM inputs — NOT PrefetchScalarGridSpec, which blows Mosaic compile
   time from ~1s to ~8min), DMAs each treelet's Woop planes HBM→VMEM
   double-buffered, and intersects all BLOCK×K pairs densely: the
   world→unit-triangle transform is a 4-term broadcast FMA on the VPU
   (exact f32 — the MXU's default-precision f32 matmul loses ~1e-3
   relative, enough to flip closest-hit winners), followed by ~12 VPU
   flops per pair and a cross-lane argmin. No gathers, no divergence,
   static shapes.

Precision: the kernel returns (t, slot); callers refine the winning
triangle with one Möller–Trumbore step (see closest_hit_woop) to remove the
f32 cancellation of the dense form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .compaction import ray_sort_keys
from .intersect import BIG_T, intersect_tri

BLOCK = 256          # rays per block (grid dim)
M_MAX = 256          # candidate treelets per block before full-scan fallback


# ---------------------------------------------------------------------------
# Phase 1: candidate selection (XLA)
# ---------------------------------------------------------------------------

def build_candidates(origins, directions, t_max, bmin, bmax, m_max=M_MAX):
    """Per-block candidate treelets via *exact per-ray* slab tests.

    A (NB, T) table is computed densely (chunked over treelets to bound
    temp memory): for each block, a treelet is a candidate iff ANY of its
    128 rays' slab test hits, and its entry bound is the MIN over rays of
    the slab tnear — exact per-ray culling is what keeps candidate counts
    small enough for the kernel on big scenes (a conservative block
    envelope overlaps nearly everything along the view axis).

    Returns (ids (NB, m_max) i32, counts (NB,), overflow (NB,), tnears
    (NB, m_max) f32 ascending).
    """
    nb = origins.shape[0] // BLOCK
    t = bmin.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-12,
                            jnp.where(directions < 0, -1e-12, 1e-12),
                            directions)
    t_max = jnp.broadcast_to(t_max, (origins.shape[0],))

    chunk = 64
    t_pad = -(-t // chunk) * chunk
    blo = jnp.pad(bmin, ((0, t_pad - t), (0, 0)), constant_values=3e38)
    bhi = jnp.pad(bmax, ((0, t_pad - t), (0, 0)), constant_values=-3e38)
    blo = blo.reshape(-1, chunk, 3)
    bhi = bhi.reshape(-1, chunk, 3)

    def chunk_fn(bounds):
        lo, hi = bounds                                # (chunk, 3)
        t1 = (lo[None, :, :] - origins[:, None, :]) * inv_d[:, None, :]
        t2 = (hi[None, :, :] - origins[:, None, :]) * inv_d[:, None, :]
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)   # (R, chunk)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_max[:, None])
        tn = jnp.where(hit, jnp.maximum(tmin, 0.0), 3e38)
        return tn.reshape(nb, BLOCK, chunk).min(axis=1)  # (NB, chunk)

    tn = jax.lax.map(chunk_fn, (blo, bhi))             # (nc, NB, chunk)
    tn = jnp.moveaxis(tn, 0, 1).reshape(nb, t_pad)[:, :t]   # (NB, T)

    overlap = tn < 3e38
    k = min(m_max, t)
    neg, ids = jax.lax.top_k(-tn, k)                   # near first
    tnears = -neg
    counts = jnp.sum(overlap, axis=-1).astype(jnp.int32)
    overflow = counts > k
    if k < m_max:
        ids = jnp.pad(ids, ((0, 0), (0, m_max - k)))
        tnears = jnp.pad(tnears, ((0, 0), (0, m_max - k)),
                         constant_values=3e38)
    return (ids.astype(jnp.int32), jnp.minimum(counts, k), overflow,
            tnears.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Phase 2: the kernel
# ---------------------------------------------------------------------------

def _intersect_kernel(n_treelets: int, k_size: int, t_epsilon: float,
                      any_hit: bool,
                      # SMEM candidate tables (windowed per 8 grid rows)
                      ids_ref, counts_ref, overflow_ref, tnears_ref,
                      # inputs
                      rays_ref,              # (8, BLOCK): ox,oy,oz,tmax, dx,dy,dz,0
                      wplanes_hbm,           # (T, 16, K): woop rows u0..3,v0..3,w0..3,pad
                      # outputs
                      t_out, slot_out,
                      # scratch
                      wp_s, sems):
    row = jnp.remainder(pl.program_id(0), 8)   # SMEM blocks span 8 rows
    count = counts_ref[row, 0]
    full = overflow_ref[row, 0] != 0
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
        return jnp.where(full, i, ids_ref[row, jnp.minimum(i, M_MAX - 1)])

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

        # Transform rays into each triangle's unit frame. The contraction
        # depth is only 4, so a broadcast FMA on the VPU is both exact f32
        # (the MXU's default f32 path rounds enough to flip closest-hit
        # winners) and fully utilized — an MXU matmul with K=4 runs at
        # ~3% utilization anyway.
        def xf(a, row0):
            acc = a[0:1, :].T * wp[row0:row0 + 1, :]        # (BLOCK, K)
            for j in range(1, 4):
                acc = acc + a[j:j + 1, :].T * wp[row0 + j:row0 + j + 1, :]
            return acc

        ou, du = xf(o4h, 0), xf(d4h, 0)
        ov, dv = xf(o4h, 4), xf(d4h, 4)
        ow, dw = xf(o4h, 8), xf(d4h, 8)

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

    def tnear_of(i):
        # full-scan blocks have no per-candidate bound: never early-exit
        return jnp.where(full, 0.0,
                         tnears_ref[row, jnp.minimum(i, M_MAX - 1)])

    init = (t_max0, jnp.full((BLOCK, 1), -1, jnp.int32))
    if any_hit:
        # early exit once every ray found an occluder. The loop body always
        # prefetches i+1, so on exit one DMA may be in flight — the epilog
        # waits it out (an orphaned start would corrupt the next grid
        # step's first buffer).
        def cond(state):
            i, (bt, bs) = state
            return (i < n_visits) & jnp.any(bs < 0)

        def wbody(state):
            i, carry = state
            return i + 1, body(i, carry)

        i_end, (best_t, best_slot) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), init))

        @pl.when(i_end < n_visits)
        def _():  # drain the prefetch issued by the last executed body
            dma(jnp.remainder(i_end, 2), treelet_id(i_end)).wait()
    else:
        # front-to-back with early termination: candidates are sorted by a
        # conservative entry-distance lower bound; once every ray's best hit
        # is closer than the next treelet's bound, no later treelet can win.
        def cond(state):
            i, (bt, bs) = state
            return (i < n_visits) & (jnp.max(bt) > tnear_of(i))

        def wbody(state):
            i, carry = state
            return i + 1, body(i, carry)

        i_end, (best_t, best_slot) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), init))

        @pl.when(i_end < n_visits)
        def _():  # drain pending prefetch (see any_hit note)
            dma(jnp.remainder(i_end, 2), treelet_id(i_end)).wait()

    # outputs are (1, BLOCK, 8) blocks; column 0 is the payload, the rest
    # padding (Mosaic layout: per-ray state lives as (BLOCK, 1) 2-D vectors)
    t_out[0, :, :] = jnp.broadcast_to(best_t, (BLOCK, 8))
    slot_out[0, :, :] = jnp.broadcast_to(best_slot, (BLOCK, 8))


@functools.partial(jax.jit, static_argnames=("k_size", "t_epsilon",
                                             "any_hit", "n_treelets"))
def _run_kernel(rays, ids, counts, overflow, tnears, wplanes,
                n_treelets: int, k_size: int, t_epsilon: float,
                any_hit: bool):
    nb = ids.shape[0]
    rays = rays.reshape(nb * 8, BLOCK)
    grid = (nb,)
    pad_nb = (-nb) % 8
    if pad_nb:  # SMEM windows span 8 grid rows — pad the tables
        ids = jnp.pad(ids, ((0, pad_nb), (0, 0)))
        counts = jnp.pad(counts, (0, pad_nb))
        overflow = jnp.pad(overflow, (0, pad_nb))
        tnears = jnp.pad(tnears, ((0, pad_nb), (0, 0)))
    in_specs = [
            # per-block candidate rows in SMEM (windowed: SMEM is 1MB —
            # whole tables OOM at 1080p); plain grid, NOT
            # PrefetchScalarGridSpec (which compiles ~500x slower)
            pl.BlockSpec((8, M_MAX), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, M_MAX), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BLOCK), lambda b: (b, 0),  # rows [8b, 8b+8)
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, BLOCK, 8), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK, 8), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_intersect_kernel, n_treelets, k_size,
                               t_epsilon, any_hit)
    interpret = jax.default_backend() == "cpu"  # CPU: emulate (tests/debug)
    t, slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, 16, k_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, BLOCK, 8), jnp.float32),
            jax.ShapeDtypeStruct((nb, BLOCK, 8), jnp.int32),
        ],
    )(ids, counts.reshape(-1, 1), overflow.reshape(-1, 1), tnears, rays,
      wplanes)
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


def _scene_bounds(tl):
    if "scene_lo" in tl:
        return tl["scene_lo"], tl["scene_hi"]
    return tl["bmin"].min(axis=0), tl["bmax"].max(axis=0)


def _scene_t_far(tl):
    lo, hi = _scene_bounds(tl)
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


def _sorted(tl, origins, directions):
    """Coherence order for ray blocks (octant + origin Morton): bounce
    rays from one jit lane-layout are scattered; without sorting their
    128-ray blocks overflow the candidate list and fall back to full
    treelet scans (compaction.py)."""
    lo, hi = _scene_bounds(tl)
    keys = ray_sort_keys(origins, directions, lo, hi)
    order = jnp.argsort(keys).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    return order, inv


def closest_hit(scene, origins, directions, config: RenderConfig,
                t_max=None, sort: bool = True):
    """Intersector ABI: (t, prim, u, v) with prim in permuted order.
    Lanes with t_max == 0 are dead and culled for free. ``sort=False``
    skips the coherence sort for ray sets already in a coherent order
    (primary rays in pixel order) — three argsorts per call otherwise."""
    tl = scene["treelets"]
    k_size = int(tl["wplanes"].shape[2])   # static (from shape, jit-safe)
    if t_max is None:
        t_max = jnp.full(origins.shape[0], BIG_T)
    t_max = jnp.broadcast_to(t_max, (origins.shape[0],))
    if sort:
        order, inv = _sorted(tl, origins, directions)
        origins = origins[order]
        directions = directions[order]
        t_max = t_max[order]
    else:
        inv = slice(None)
    o, d, tm, r = _pad_rays(origins, directions, t_max)
    n_treelets = tl["bmin"].shape[0]
    ids, counts, overflow, tnears = build_candidates(
        o, d, tm, tl["bmin"], tl["bmax"])
    import os as _os
    if _os.environ.get("RFW_PALLAS_FULLSCAN") == "1":  # debug bisect
        overflow = jnp.ones_like(overflow)

    # Two-phase closest hit. Pass 1 visits only the nearest few candidate
    # treelets per block — that bounds most rays' best_t. The re-cull with
    # those per-ray bounds collapses candidate counts (a treelet behind the
    # found hit can't win), so pass 2 touches a fraction of the pairs. Rays
    # that missed in pass 1 keep t_max and redo their full list.
    n1 = 4
    zero_ov = jnp.zeros_like(overflow, jnp.int32)
    t1, slot1 = _run_kernel(_pack_rays(o, d, tm), ids,
                            jnp.minimum(counts, n1), zero_ov,
                            tnears, tl["wplanes"], n_treelets, k_size,
                            float(config.t_epsilon), False)
    t_bound = jnp.where(slot1 >= 0, t1, tm)
    ids2, counts2, overflow2, tnears2 = build_candidates(
        o, d, t_bound, tl["bmin"], tl["bmax"])
    t2, slot2 = _run_kernel(_pack_rays(o, d, t_bound), ids2, counts2,
                            overflow2.astype(jnp.int32), tnears2,
                            tl["wplanes"], n_treelets, k_size,
                            float(config.t_epsilon), False)
    better = slot2 >= 0
    t = jnp.where(better, t2, t1)[:r]
    slot = jnp.where(better, slot2, slot1)[:r]
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
    return (jnp.where(found, t, BIG_T)[inv], jnp.where(found, prim, -1)[inv],
            u[inv], v[inv])


def any_hit(scene, origins, directions, dist, config: RenderConfig,
            sort: bool = True):
    """Occlusion test: True where something lies closer than ``dist``."""
    tl = scene["treelets"]
    k_size = int(tl["wplanes"].shape[2])
    if sort:
        order, inv = _sorted(tl, origins, directions)
        origins = origins[order]
        directions = directions[order]
        dist = dist[order]
    else:
        inv = slice(None)
    o, d, tm, r = _pad_rays(origins, directions, dist)
    ids, counts, overflow, tnears = build_candidates(
        o, d, tm, tl["bmin"], tl["bmax"])
    rays = _pack_rays(o, d, tm)
    n_treelets = tl["bmin"].shape[0]
    _, slot = _run_kernel(rays, ids, counts, overflow.astype(jnp.int32),
                          tnears, tl["wplanes"],
                          n_treelets, k_size, float(config.t_epsilon), True)
    return (slot[:r] >= 0)[inv]
