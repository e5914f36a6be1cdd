"""Pallas/TPU super-cell intersection kernel — the flagship fast path.

TPU-native replacement for the reference's SIMD/SIMT BVH traversal
(/root/reference/RFW/system/bvh/.../mbvh_node.h:122-307 and the CUDA MBVH
walker, CUDART/src/CUDAIntersect.h). A lockstep VPU cannot chase per-ray
node pointers, so the structure is dense-with-spatial-culling:

* Triangles live in SPATIALLY DISJOINT cells of K tris (bvh/wide.py
  spatial_treelets — centroid-median kd cells, near-100% occupancy).
* ``SUPER_G`` consecutive cells (kd siblings) form a *super*: the cull
  unit and the DMA unit (one contiguous (G*16, K) Woop-plane block).
* **Cull (XLA, per ray-BLOCK):** a conservative interval-arithmetic slab
  test of each block's ray envelope (origin box x direction interval,
  octant-uniform after the coherence sort) against super AABBs. Cost is
  blocks x supers — ~1000x cheaper than the per-ray x per-cell table a
  flat cull needs, which is what makes small cells affordable.
* **Kernel (Pallas):** per block, walk candidate supers front-to-back
  (conservative entry bounds from the cull); per super, DMA its Woop
  planes HBM->VMEM double-buffered, slab-test the G member cells against
  all BLOCK rays (vectorized, (BLOCK, G)), and densely intersect only
  cells where some ray's entry is closer than its current best hit.
  Early exit once every ray's best hit precedes the next super's bound.

The dense test is the same exact-f32 VPU broadcast-FMA Woop transform as
before (MXU f32 matmuls at default precision flip closest-hit winners);
callers refine the winning triangle with one Moller-Trumbore step.

Measured rationale (tools/spatial_cut_proto.py, pica-4x 305k tris): a ray
crosses ~1-2 disjoint cells before its hit vs ~75 overlapping SAH-subtree
treelets — the per-cell skip converts that into ~10-20x less dense work
than the v1 per-treelet-candidate-list kernel, while the block-envelope
cull removes the R x T slab table that dominated v1's runtime.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .compaction import ray_sort_keys
from .intersect import BIG_T, intersect_tri

BLOCK = 256          # rays per block (grid dim)
SUPER_G = 8          # cells per super (DMA/cull granularity)
M_S = 128            # candidate supers per block before full-scan fallback
PIPE = 4             # in-flight super DMAs: per-visit compute (~0.6us, one
#                      active cell) is far below the ~4us HBM latency, so a
#                      2-deep pipeline serializes on latency; 4-deep hides it


# ---------------------------------------------------------------------------
# Phase 1: block-envelope candidate supers (XLA)
# ---------------------------------------------------------------------------

def build_super_candidates(origins, directions, t_max, sbmin, sbmax,
                           cbmin=None, cbmax=None, m_s=M_S):
    """Conservative per-BLOCK candidate supers via interval slab tests.

    For each 256-ray block: bound the (alive) ray origins and directions
    per axis; blocks are octant-sorted, so direction signs are uniform
    except at octant boundaries (those blocks fall back to a full scan,
    which the kernel's per-cell masks then prune). Interval arithmetic
    gives a lower bound of every ray's slab entry and an upper bound of
    its exit — a super overlaps the block iff those straddle.

    When per-cell bounds (cbmin/cbmax, (T_cells, 3)) are given, the top
    ``refine`` candidates are re-tested at CELL granularity: a super whose
    member cells all miss the envelope drops out, and its entry bound
    tightens to its nearest overlapped cell. (The kernel itself denses all
    G cells of a visited super unconditionally — measured, any per-cell
    branch costs 0.3-0.5 µs against 0.66 µs of gated work, so visit
    selection is the only lever that pays.)

    Returns (ids (NB, k) i32 near-first, counts (NB,), overflow (NB,),
    tnears (NB, k) f32 ascending lower bounds).
    """
    nb = origins.shape[0] // BLOCK
    ts = sbmin.shape[0]
    big = jnp.float32(3e38)
    o = origins.reshape(nb, BLOCK, 3)
    d = directions.reshape(nb, BLOCK, 3)
    tm = t_max.reshape(nb, BLOCK)
    alive = (tm > 0)[..., None]

    o_lo = jnp.min(jnp.where(alive, o, big), axis=1)      # (NB, 3)
    o_hi = jnp.max(jnp.where(alive, o, -big), axis=1)
    d_lo = jnp.min(jnp.where(alive, d, big), axis=1)
    d_hi = jnp.max(jnp.where(alive, d, -big), axis=1)
    any_alive = jnp.any(alive[..., 0], axis=1)            # (NB,)
    tm_ub = jnp.max(tm, axis=1)                           # (NB,)

    dpos = d_lo >= 0
    dneg = d_hi <= 0
    mixed_ax = ~(dpos | dneg)                             # (NB, 3)

    # canonicalize to positive-direction axes: o' = ±o, box mirrored.
    # A mixed-sign axis (block straddles an octant boundary) contributes
    # no constraint: entry lb 0, exit ub +inf — conservative and correct,
    # and far cheaper than flagging the whole block for a full scan.
    co_lo = jnp.where(dpos, o_lo, -o_hi)
    co_hi = jnp.where(dpos, o_hi, -o_lo)
    da_lo = jnp.maximum(jnp.where(dpos, d_lo, -d_hi), 1e-12)
    da_hi = jnp.maximum(jnp.where(dpos, d_hi, -d_lo), da_lo)
    i_lo = 1.0 / da_hi                                    # (NB, 3) > 0
    i_hi = 1.0 / da_lo

    def envelope_slab(bmin_g, bmax_g):
        """bmin_g/bmax_g (NB, ..., 3) → (overlap, tnear_lb) over blocks."""
        exp = (slice(None),) + (None,) * (bmin_g.ndim - 2) + (slice(None),)
        blo = jnp.where(dpos[exp], bmin_g, -bmax_g)
        bhi = jnp.where(dpos[exp], bmax_g, -bmin_g)
        a_lo = blo - co_hi[exp]
        e_lb = a_lo * jnp.where(a_lo >= 0, i_lo[exp], i_hi[exp])
        b_hi = bhi - co_lo[exp]
        x_ub = b_hi * jnp.where(b_hi >= 0, i_hi[exp], i_lo[exp])
        e_lb = jnp.where(mixed_ax[exp], 0.0, e_lb)
        x_ub = jnp.where(mixed_ax[exp], big, x_ub)
        tmin_lb = jnp.max(e_lb, axis=-1)
        tmax_ub = jnp.min(x_ub, axis=-1)
        red = (slice(None),) + (None,) * (bmin_g.ndim - 2)
        overlap = ((tmax_ub >= jnp.maximum(tmin_lb, 0.0))
                   & (tmin_lb < tm_ub[red])
                   & any_alive[red])
        return overlap, jnp.maximum(tmin_lb, 0.0)

    overlap, tnear = envelope_slab(
        jnp.broadcast_to(sbmin[None], (nb, ts, 3)),
        jnp.broadcast_to(sbmax[None], (nb, ts, 3)))
    tn = jnp.where(overlap, tnear, big)

    k = min(m_s, ts)
    neg, ids = jax.lax.top_k(-tn, k)                      # near first
    tnears = -neg
    ids = ids.astype(jnp.int32)
    counts = jnp.sum(overlap, axis=-1).astype(jnp.int32)
    overflow = counts > k

    if cbmin is None:
        return ids, jnp.minimum(counts, k), overflow, tnears

    # cell-level refinement of the nearest `refine` candidates (the gather
    # over cell bounds is the expensive part — most blocks have few
    # candidates, so refining the near ones is enough)
    refine = min(32, k)
    rid = ids[:, :refine]
    cell_ids = rid[..., None] * SUPER_G + jnp.arange(SUPER_G)  # (NB,r,G)
    c_over, c_tn = envelope_slab(cbmin[cell_ids], cbmax[cell_ids])
    occupied = jnp.any(c_over, axis=-1)                   # (NB, r)
    tn2 = jnp.where(c_over, c_tn, big).min(axis=-1)
    key = jnp.where(occupied & (tnears[:, :refine] < big), tn2, big)
    key = jnp.concatenate([key, tnears[:, refine:]], axis=-1)
    order = jnp.argsort(key, axis=-1)
    ids = jnp.take_along_axis(ids, order, axis=-1)
    tnears = jnp.take_along_axis(key, order, axis=-1)
    counts2 = jnp.sum(tnears < big, axis=-1).astype(jnp.int32)
    # overflow blocks keep the super-level count semantics (full scan)
    return (ids, jnp.where(overflow, jnp.minimum(counts, k), counts2),
            overflow, tnears.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Phase 2: the kernel
# ---------------------------------------------------------------------------

def _sv_kernel(n_super: int, k_size: int, m_s: int, t_epsilon: float,
               any_hit: bool,
               # SMEM candidate tables (windowed per 8 grid rows)
               ids_ref, counts_ref, overflow_ref, tnears_ref,
               # inputs
               rays_ref,              # (8, BLOCK): ox,oy,oz,tmax, dx,dy,dz,0
               wsup_hbm,              # (T_s, G*16, K) woop rows per super
               # outputs
               t_out, slot_out, stat_out,
               # scratch: hit state lives in refs (a lax.cond with vector
               # carries lowers to select — both sides execute)
               bt_s, bs_s, wp_s, sems):
    row = jnp.remainder(pl.program_id(0), 8)   # SMEM blocks span 8 rows
    count = counts_ref[row, 0]
    full = overflow_ref[row, 0] != 0
    n_visits = jnp.where(full, n_super, count)

    rays = rays_ref[:]                       # (8, BLOCK)
    t_max0 = rays[3:4, :].T                  # (BLOCK, 1)
    ones = jnp.ones((1, BLOCK), jnp.float32)
    zeros = jnp.zeros((1, BLOCK), jnp.float32)
    o4h = jnp.concatenate([rays[0:3, :], ones], axis=0)    # (4, BLOCK)
    d4h = jnp.concatenate([rays[4:7, :], zeros], axis=0)

    bt_s[:] = t_max0
    bs_s[:] = jnp.full((BLOCK, 1), -1, jnp.int32)

    def super_id(i):
        return jnp.where(full, i, ids_ref[row, jnp.minimum(i, m_s - 1)])

    def tnear_of(i):
        # full-scan blocks have no per-candidate bound: never early-exit
        return jnp.where(full, 0.0,
                         tnears_ref[row, jnp.minimum(i, m_s - 1)])

    def dma(slot, sid):
        return pltpu.make_async_copy(
            wsup_hbm.at[sid], wp_s.at[slot], sems.at[slot])

    for k in range(PIPE - 1):       # prime the pipeline
        @pl.when(k < n_visits)
        def _(k=k):
            dma(k, super_id(k)).start()

    def body(state):
        i, _done, cells = state
        slot = jnp.remainder(i, PIPE)

        @pl.when(i + PIPE - 1 < n_visits)
        def _():
            dma(jnp.remainder(i + PIPE - 1, PIPE),
                super_id(i + PIPE - 1)).start()

        dma(slot, super_id(i)).wait()

        sid = super_id(i)
        wp = wp_s[slot]                      # (G*16, K)

        # dense-intersect ALL G member cells, no per-cell branches:
        # measured, any branch (vector reduction ~0.3 µs or SMEM scalar
        # ~0.5 µs) costs as much as the 0.66 µs of dense work it would
        # gate — visit selection happens entirely in the cull
        ablate = os.environ.get("RFW_SV_ABLATE", "")  # perf bisect hook
        for j in range(SUPER_G if ablate != "nodense" else 0):
            cells = cells + 1
            base = 16 * j
            bt = bt_s[:]

            def xf(a, r0):
                acc = a[0:1, :].T * wp[base + r0:base + r0 + 1, :]
                for q in range(1, 4):
                    acc = acc + (a[q:q + 1, :].T
                                 * wp[base + r0 + q:
                                      base + r0 + q + 1, :])
                return acc                   # (BLOCK, K)

            ou, du = xf(o4h, 0), xf(d4h, 0)
            ov, dv = xf(o4h, 4), xf(d4h, 4)
            ow, dw = xf(o4h, 8), xf(d4h, 8)
            valid = jnp.abs(dw) > 1e-12
            t = -ow / jnp.where(valid, dw, 1.0)
            u = ou + t * du
            v = ov + t * dv
            hit = (valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t > t_epsilon) & (t < bt))
            t_hit = jnp.where(hit, t, 1e30)
            tmin = jnp.min(t_hit, axis=1, keepdims=True)
            kbest = jnp.argmin(t_hit, axis=1, keepdims=True).astype(
                jnp.int32)
            better = tmin < bt
            bs_s[:] = jnp.where(
                better, (sid * SUPER_G + j) * k_size + kbest, bs_s[:])
            bt_s[:] = jnp.where(better, tmin, bt)

        if any_hit:
            done = ~jnp.any(bs_s[:] < 0)
        else:
            # front-to-back: once every ray's best hit precedes the next
            # super's conservative entry bound, no later super can win
            done = jnp.max(bt_s[:]) <= tnear_of(i + 1)
        return i + 1, done, cells

    def cond(state):
        i, done, cells = state
        return (i < n_visits) & ~done

    i_end, _, cells = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), jnp.int32(0)))

    for k in range(PIPE - 1):  # drain in-flight DMAs on early exit
        @pl.when(i_end + k < n_visits)
        def _(k=k):
            dma(jnp.remainder(i_end + k, PIPE), super_id(i_end + k)).wait()

    t_out[0, :, :] = jnp.broadcast_to(bt_s[:], (BLOCK, 8))
    slot_out[0, :, :] = jnp.broadcast_to(bs_s[:], (BLOCK, 8))
    stat_out[row, 0] = i_end      # supers visited
    stat_out[row, 1] = cells      # cells densely intersected
    stat_out[row, 2] = count
    stat_out[row, 3] = full.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_size", "t_epsilon",
                                             "any_hit", "n_super"))
def _run_kernel(rays, ids, counts, overflow, tnears, wsup,
                n_super: int, k_size: int, t_epsilon: float,
                any_hit: bool):
    nb = ids.shape[0]
    m_s = ids.shape[1]
    rays = rays.reshape(nb * 8, BLOCK)
    grid = (nb,)
    pad_nb = (-nb) % 8
    if pad_nb:  # SMEM windows span 8 grid rows — pad the tables
        ids = jnp.pad(ids, ((0, pad_nb), (0, 0)))
        counts = jnp.pad(counts, (0, pad_nb))
        overflow = jnp.pad(overflow, (0, pad_nb))
        tnears = jnp.pad(tnears, ((0, pad_nb), (0, 0)))
    in_specs = [
            # per-block candidate rows in SMEM (windowed: SMEM is small —
            # whole tables OOM at 1080p); plain grid, NOT
            # PrefetchScalarGridSpec (which compiles ~500x slower)
            pl.BlockSpec((8, m_s), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, m_s), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BLOCK), lambda b: (b, 0),  # rows [8b, 8b+8)
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, BLOCK, 8), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK, 8), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 8), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(_sv_kernel, n_super, k_size, m_s,
                               t_epsilon, any_hit)
    interpret = jax.default_backend() == "cpu"  # CPU: emulate (tests/debug)
    t, slot, stats = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.int32),
            pltpu.VMEM((PIPE, SUPER_G * 16, k_size), jnp.float32),
            pltpu.SemaphoreType.DMA((PIPE,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, BLOCK, 8), jnp.float32),
            jax.ShapeDtypeStruct((nb, BLOCK, 8), jnp.int32),
            jax.ShapeDtypeStruct((nb + pad_nb, 8), jnp.int32),
        ],
    )(ids, counts.reshape(-1, 1), overflow.reshape(-1, 1), tnears,
      rays, wsup)
    return t[:, :, 0].reshape(-1), slot[:, :, 0].reshape(-1), stats[:nb]


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


def _sorted(tl, origins, directions, t_max):
    """Coherence order for ray blocks: dead lanes last (their blocks exit
    instantly), then direction octant, then origin Morton. Octant-major
    ordering is what keeps block direction signs uniform for the
    interval-arithmetic cull."""
    lo, hi = _scene_bounds(tl)
    keys = ray_sort_keys(origins, directions, lo, hi)
    keys = keys + jnp.where(t_max <= 0, jnp.uint32(1) << 28, 0).astype(
        jnp.uint32)
    order = jnp.argsort(keys).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    return order, inv


def _wsup(tl):
    """Woop planes regrouped per super: (T_s, G*16, K) — a C-contiguous
    reshape of the per-cell (T, 16, K) layout."""
    wp = tl["wplanes"]
    t, rows, k = wp.shape
    return wp.reshape(t // SUPER_G, SUPER_G * rows, k)


def closest_hit(scene, origins, directions, config: RenderConfig,
                t_max=None, sort: bool = True):
    """Intersector ABI: (t, prim, u, v) with prim in permuted order.
    Lanes with t_max == 0 are dead and culled for free. ``sort=False``
    skips the coherence sort for ray sets already in a coherent order
    (primary rays in pixel order)."""
    tl = scene["treelets"]
    k_size = int(tl["wplanes"].shape[2])   # static (from shape, jit-safe)
    if t_max is None:
        t_max = jnp.full(origins.shape[0], BIG_T)
    t_max = jnp.broadcast_to(t_max, (origins.shape[0],))
    if sort:
        order, inv = _sorted(tl, origins, directions, t_max)
        origins = origins[order]
        directions = directions[order]
        t_max = t_max[order]
    else:
        inv = slice(None)
    o, d, tm, r = _pad_rays(origins, directions, t_max)
    ids, counts, overflow, tnears = build_super_candidates(
        o, d, tm, tl["sbmin"], tl["sbmax"], tl["bmin"], tl["bmax"])
    if os.environ.get("RFW_PALLAS_FULLSCAN") == "1":  # debug bisect
        overflow = jnp.ones_like(overflow)
    n_super = tl["sbmin"].shape[0]
    t, slot, _ = _run_kernel(_pack_rays(o, d, tm), ids, counts,
                             overflow.astype(jnp.int32), tnears,
                             _wsup(tl), n_super, k_size,
                             float(config.t_epsilon), False)
    t = t[:r]
    slot = slot[:r]
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
        order, inv = _sorted(tl, origins, directions, dist)
        origins = origins[order]
        directions = directions[order]
        dist = dist[order]
    else:
        inv = slice(None)
    o, d, tm, r = _pad_rays(origins, directions, dist)
    ids, counts, overflow, tnears = build_super_candidates(
        o, d, tm, tl["sbmin"], tl["sbmax"], tl["bmin"], tl["bmax"])
    n_super = tl["sbmin"].shape[0]
    _, slot, _ = _run_kernel(_pack_rays(o, d, tm), ids, counts,
                             overflow.astype(jnp.int32), tnears,
                             _wsup(tl), n_super, k_size,
                             float(config.t_epsilon), True)
    return (slot[:r] >= 0)[inv]
