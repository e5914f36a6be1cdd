"""Per-ray pair-expansion Pallas intersector — scattered-ray fast path.

The super-cell kernel (ops/pallas_intersect.py) culls per ray-BLOCK
envelope: coherent primary blocks carry ~28 candidate supers, but scattered
bounce blocks carry ~102 (measured, tools/bounce_diag.py) because a block
pays the *union* of its rays' slab paths. This module replaces the per-block
union with exact per-RAY candidates — the TPU answer to per-ray BVH
traversal (reference mbvh_node.h:122-307, CUDAIntersect.h), restructured for
a lockstep VPU:

1. **Enumerate (XLA)**: each ray slab-tests every super AABB (a fused
   (N, T_s) map — no gathers) and selects its C_MAX nearest overlapped
   supers by a vectorized row sort of packed ``(quantized-entry, sid)``
   keys. The packing makes keys unique, so a per-ray key watermark gives
   exact windowed continuation (front-to-back), and a found hit tightens
   the slab horizon so later passes enumerate nothing for finished rays.
2. **Expand + sort**: the (N, C_MAX) candidate matrix *is* the pair list
   (pads last); one global sort by super id clusters pairs so a kernel
   block references only ~1-2 distinct supers (measured 1.02-1.03) —
   near-100% lane utilization.
3. **Kernel (Pallas)**: per block of ``PBLOCK`` pairs, walk the precomputed
   distinct-super visit list; per visit, DMA the super's Woop planes
   HBM→VMEM (pipelined) and dense-intersect all pair lanes against its G
   cells, committing only lanes whose pair references the visited super.
4. **Combine (XLA)**: segment-min over pair rays; unfinished rays loop.

Driver architecture (phase-profiled, tools/pairs_phases.py): enumerate
ONCE keeping the C_KEEP nearest candidate keys per ray, then iterate
C_MAX-wide windows over the cache with per-ray window pointers (one-hot
window selects — no gathers), and slice the expanded pair list to
n*PAIR_BUDGET before the kernel (real pairs sort before pads; cut-off
slots are marked unprocessed and retried). Re-enumeration was 82 ms and
the padded-pair ray-row gather 160 ms of every 361 ms pass; the bench
bounce-closest went 651 → 469 ms with this driver (and scattered any-hit
1568 → 937 ms, now beating the super-cell kernel's 1081 ms).

Design rules learned by measurement (tools/select_microbench.py,
tools/pairs_profile.py, on v5e):
* XLA scatter is ~50x slower than a row sort — compaction by scatter is
  out; padded-flatten + lax.sort wins.
* Per-ray gathers of AABB rows cost ~100x the slab flops they feed —
  enumeration must be gather-free, which is why candidates live at SUPER
  granularity (broadcast tables) and cells are only touched inside the
  kernel's DMA'd blocks.
* lax.top_k ≈ full row sort in cost; the row sort also yields ascending
  order, which the watermark windows need anyway.
* sid-ordered enumeration (no entry packing) needs ~12 candidates/ray on
  full paths vs ~2 the hit actually requires — entry-first packing plus the
  best-t horizon is what makes single-pass the common case.

Ray sorting (octant+Morton, ops/compaction.py) stays upstream: it is what
makes neighbouring pairs share supers so the global pair sort stays cheap.
Dead lanes (t_max == 0) produce zero pairs — wavefront compaction is free
in the pair domain (SURVEY §2.9: sort/prefix instead of atomic queues).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .intersect import BIG_T, intersect_tri, safe_inv_dir

PBLOCK = 512       # pairs per kernel program
C_MAX = 24         # candidate supers processed per ray per window. Each
#                    windowed pass pays fixed sort costs, so fatter passes
#                    win until the pair-sort size dominates: bench bounce
#                    closest 807/701/651/761 ms at 8/16/24/32
#                    (tools/cmax_sweep.py, 518k scattered rays, pica-4x)
C_KEEP = 96        # candidate keys cached per ray by the enumerate-ONCE
#                    phase (measured max crossings on the bench bounce
#                    workload: 62; rays needing more fall to the legacy
#                    re-enumeration loop). Re-sorting (N, T_s) keys every
#                    pass was 82 ms of each 361 ms pass.
PAIR_BUDGET = 12   # kernel pair slots per ray: the expanded pair list is
#                    sliced to n*PAIR_BUDGET before the kernel (real pairs
#                    sort before pads, and measured mean candidates/ray is
#                    7.1 — the full n*C_MAX gather of ray rows was 160 ms
#                    of the 177 ms kernel phase). Slots cut off in the
#                    rare overflow case are marked unprocessed (-2) and
#                    their rays retry the same window next iteration.
A_MAX = 16         # phase-A window iterations bound (4 windows + retries)
PIPE = 4           # in-flight super DMAs
MAX_PASSES = 64    # hard bound on windowed passes (termination guard)
_BIGKEY = np.float32(1 << 25)   # > any packed (q, sid) key (np: no
#                                 backend init at import)


def _sid_bits(t_s: int) -> int:
    return max((t_s - 1).bit_length(), 1)


# ---------------------------------------------------------------------------
# Phase 1: per-ray candidate supers (entry-ordered, windowed, gather-free)
# ---------------------------------------------------------------------------

def _qbits(t_s: int) -> int:
    return 24 - _sid_bits(t_s)


def ray_super_candidates(origins, directions, t_hi, win_key, tl,
                         c_max: int = C_MAX):
    """Per ray: the ≤``c_max`` *nearest* supers whose AABB the ray crosses
    within [0, t_hi), restricted to packed key ≥ ``win_key`` (watermark).

    Keys pack quantized-entry·2^sid_bits + sid into exact-integer f32
    (< 2^24 — f32 row sorts measure ~2x faster than u32). Keys are unique
    per super, so watermark continuation is exact; quantization only
    perturbs front-to-back order within a ~diag/2^qbits granularity, never
    correctness.

    Returns (cand (N, c_max) i32 sids with T_s padding, keys (N, c_max)
    f32, count (N,), complete (N,)).
    """
    sbmin, sbmax = tl["sbmin"], tl["sbmax"]
    t_s = sbmin.shape[0]
    sb = _sid_bits(t_s)
    qmax = (1 << _qbits(t_s)) - 1
    lo, hi = _scene_bounds(tl)
    inv_diag = 1.0 / jnp.sqrt(jnp.sum((hi - lo) ** 2))

    inv = safe_inv_dir(directions)
    t1 = (sbmin[None] - origins[:, None]) * inv[:, None]
    t2 = (sbmax[None] - origins[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)            # (N, T_s)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    entry = jnp.maximum(tn, 0.0)
    # non-empty [entry, min(tf,t_hi)) — also kills dead lanes (t_hi 0)
    hit = entry < jnp.minimum(tf, t_hi[:, None])
    q = jnp.minimum(jnp.floor(entry * (inv_diag * qmax)),
                    jnp.float32(qmax))
    sid = jnp.arange(t_s, dtype=jnp.float32)[None]
    key = q * (1 << sb) + sid                              # exact < 2^24
    key = jnp.where(hit & (key >= win_key[:, None]), key, _BIGKEY)
    keys = jax.lax.sort(key, dimension=-1)[:, :c_max]
    count = jnp.sum(key < _BIGKEY, axis=-1).astype(jnp.int32)
    cand = jnp.where(
        keys < _BIGKEY,
        keys.astype(jnp.int32) & ((1 << sb) - 1), t_s)
    return cand, keys, count, count <= c_max


# ---------------------------------------------------------------------------
# Phase 2: pair expansion (scatter-free) + visit lists
# ---------------------------------------------------------------------------

def expand_pairs(cand, t_s: int):
    """(N, C) candidate matrix → pairs sorted by sid. Pads (sid == t_s)
    sort to the tail. Returns (pair_sid (P,), pair_flat (P,)) with
    ``pair_flat`` the pre-sort flat index (ray·C + slot) — ray = flat // C,
    and sorting results back by flat restores (N, C) order for the
    per-ray combine without scatter.

    Packs (sid, flat) into one u32 when it fits (sid needs sid_bits+1 for
    the t_s pad) — a single-operand u32 sort beats a 2-operand one.
    """
    n, c = cand.shape
    p = n * c
    flat = jnp.arange(p, dtype=jnp.int32).reshape(n, c)
    fb = max((p - 1).bit_length(), 1)
    sb1 = _sid_bits(t_s) + 1          # sid can equal t_s (pad)
    if fb + sb1 <= 32:
        key = (cand.astype(jnp.uint32) << fb) | flat.astype(jnp.uint32)
        key = jax.lax.sort(key.reshape(-1), dimension=0)
        pair_flat = (key & jnp.uint32((1 << fb) - 1)).astype(jnp.int32)
        pair_sid = (key >> fb).astype(jnp.int32)
    else:
        pair_sid, pair_flat = jax.lax.sort(
            (cand.reshape(-1), flat.reshape(-1)), num_keys=1,
            is_stable=True)
    return pair_sid, pair_flat


def block_visit_lists(pair_sid, t_s: int):
    """Per PBLOCK-pair block: distinct sids (ascending, padded t_s) and
    count. pair_sid must be globally sorted, so distinct-per-block ≤
    min(PBLOCK, t_s+1)."""
    nb = pair_sid.shape[0] // PBLOCK
    c = pair_sid.reshape(nb, PBLOCK)
    prev = jnp.concatenate([jnp.full((nb, 1), -1, jnp.int32), c[:, :-1]],
                           axis=1)
    first = (c != prev) & (c < t_s)
    d = min(PBLOCK, t_s)
    visits = jnp.sort(jnp.where(first, c, t_s), axis=-1)[:, :d]
    counts = jnp.sum(first, axis=-1).astype(jnp.int32)
    return visits, counts


# ---------------------------------------------------------------------------
# Phase 3: the pair kernel
# ---------------------------------------------------------------------------

def _pair_kernel(super_g: int, k_size: int, t_epsilon: float, any_hit: bool,
                 use_skip: bool,
                 # SMEM (windowed over 8 grid rows)
                 visits_ref, nvisit_ref,
                 # VMEM
                 rays_ref,               # (8, PBLOCK) ox,oy,oz,tmax,dx,dy,dz,
                 #                         sid — the pair's super id rides in
                 #                         row 7 as exact-int f32: a separate
                 #                         (P, 1) i32 operand would be padded
                 #                         to 128 lanes in HBM (128x memory —
                 #                         11.8 GB OOM at 1M-ray launches)
                 wsup_hbm,               # (T_s, G*16, K) woop planes
                 # outputs
                 t_out, slot_out,
                 # scratch
                 bt_s, bs_s, wp_s, sems):
    row = jnp.remainder(pl.program_id(0), 8)
    n_visit = nvisit_ref[row, 0]

    rays = rays_ref[:]
    t_max0 = rays[3:4, :].T                   # (PBLOCK, 1)
    t_hi_row = rays[3:4, :]                   # (1, PBLOCK)
    ones = jnp.ones((1, PBLOCK), jnp.float32)
    zeros = jnp.zeros((1, PBLOCK), jnp.float32)
    o4 = jnp.concatenate([rays[0:3, :], ones], axis=0)
    d4 = jnp.concatenate([rays[4:7, :], zeros], axis=0)
    my_sid = rays[7:8, :].T.astype(jnp.int32)   # (PBLOCK, 1)
    # safe per-axis inverse directions for the cell-interest slab test
    inv_r = []
    for ax in range(3):
        dax = rays[4 + ax:5 + ax, :]
        safe = jnp.where(jnp.abs(dax) < 1e-12,
                         jnp.where(dax < 0, -1e-12, 1e-12), dax)
        inv_r.append(1.0 / safe)

    bt_s[:] = t_max0
    bs_s[:] = jnp.full((PBLOCK, 1), -1, jnp.int32)

    def visit_id(i):
        return visits_ref[row, jnp.minimum(i, visits_ref.shape[1] - 1)]

    def dma(slot, sid):
        return pltpu.make_async_copy(
            wsup_hbm.at[sid], wp_s.at[slot], sems.at[slot])

    for k in range(PIPE - 1):
        @pl.when(k < n_visit)
        def _(k=k):
            dma(k, visit_id(k)).start()

    def body(state):
        i, _ = state
        slot = jnp.remainder(i, PIPE)

        @pl.when(i + PIPE - 1 < n_visit)
        def _():
            dma(jnp.remainder(i + PIPE - 1, PIPE),
                visit_id(i + PIPE - 1)).start()

        dma(slot, visit_id(i)).wait()
        cur = visit_id(i)
        wp = wp_s[slot]                       # (G*16, K)
        mine_lane = my_sid == cur             # (PBLOCK, 1)

        for j in range(super_g):
            base = 16 * j

            def dense(j=j, base=base):
                bt = bt_s[:]

                def xf(a, r0):
                    acc = a[0:1, :].T * wp[base + r0:base + r0 + 1, :]
                    for q in range(1, 4):
                        acc = acc + (a[q:q + 1, :].T
                                     * wp[base + r0 + q:
                                          base + r0 + q + 1, :])
                    return acc                # (PBLOCK, K)

                ou, du = xf(o4, 0), xf(d4, 0)
                ov, dv = xf(o4, 4), xf(d4, 4)
                ow, dw = xf(o4, 8), xf(d4, 8)
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
                mine = mine_lane & (tmin < bt)
                bs_s[:] = jnp.where(
                    mine, (cur * super_g + j) * k_size + kbest, bs_s[:])
                bt_s[:] = jnp.where(mine, tmin, bt)

            if use_skip:
                # cell-interest skip: conservative slab of ALL lanes vs
                # cell j (bounds ride in wp row base+12 lanes 0-5 — same
                # DMA). Measured NET LOSS at visits≈1/block (108 vs 60 ms,
                # tools/pairs_kernel_ab.py) — kept only as an ablation.
                tn_r = zeros
                tf_r = jnp.full((1, PBLOCK), 1e30, jnp.float32)
                for ax in range(3):
                    t1 = (wp[base + 12, ax]
                          - rays[ax:ax + 1, :]) * inv_r[ax]
                    t2 = (wp[base + 12, 3 + ax]
                          - rays[ax:ax + 1, :]) * inv_r[ax]
                    tn_r = jnp.maximum(tn_r, jnp.minimum(t1, t2))
                    tf_r = jnp.minimum(tf_r, jnp.maximum(t1, t2))
                interest = jnp.any(jnp.maximum(tn_r, 0.0)
                                   < jnp.minimum(tf_r, t_hi_row))
                pl.when(interest)(dense)
            else:
                dense()

        if any_hit:
            done = ~jnp.any((bs_s[:] < 0) & (t_max0 > 0) & (my_sid >= cur))
        else:
            done = jnp.bool_(False)
        return i + 1, done

    def cond(state):
        i, done = state
        return (i < n_visit) & ~done

    i_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                               jnp.bool_(False)))

    for k in range(PIPE - 1):   # drain in-flight DMAs on early exit
        @pl.when(i_end + k < n_visit)
        def _(k=k):
            dma(jnp.remainder(i_end + k, PIPE), visit_id(i_end + k)).wait()

    # (PBLOCK, 1) → (1, PBLOCK) relayout: minor-dim-8 output blocks DMA as
    # hundreds of 32-byte strided segments (~5 µs/program — measured as the
    # kernel's dominant fixed cost); lane-major rows stream contiguously.
    t_out[0, :, :] = jnp.broadcast_to(
        bt_s[:].reshape(1, PBLOCK), (8, PBLOCK))
    slot_out[0, :, :] = jnp.broadcast_to(
        bs_s[:].reshape(1, PBLOCK), (8, PBLOCK))


@functools.partial(jax.jit, static_argnames=("super_g", "k_size",
                                             "t_epsilon", "any_hit",
                                             "use_skip"))
def _run_pair_kernel(rays8, visits, nvisit, wsup,
                     super_g: int, k_size: int, t_epsilon: float,
                     any_hit: bool, use_skip: bool = False):
    """rays8 (NB*8, PBLOCK) with the pair's super id in row 7 (exact-int
    f32); visits (NB, D); nvisit (NB,). Returns per-pair (t, slot)."""
    nb = visits.shape[0]
    d = visits.shape[1]
    pad_nb = (-nb) % 8
    if pad_nb:
        visits = jnp.pad(visits, ((0, pad_nb), (0, 0)))
        nvisit = jnp.pad(nvisit, (0, pad_nb))
    in_specs = [
        pl.BlockSpec((8, d), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, 1), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, PBLOCK), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, 8, PBLOCK), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, PBLOCK), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_pair_kernel, super_g, k_size, t_epsilon,
                               any_hit, use_skip)
    interpret = jax.default_backend() == "cpu"
    t, slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        scratch_shapes=[
            pltpu.VMEM((PBLOCK, 1), jnp.float32),
            pltpu.VMEM((PBLOCK, 1), jnp.int32),
            pltpu.VMEM((PIPE, super_g * 16, k_size), jnp.float32),
            pltpu.SemaphoreType.DMA((PIPE,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 8, PBLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, PBLOCK), jnp.int32),
        ],
    )(visits, nvisit.reshape(-1, 1), rays8, wsup)
    return t[:, 0, :].reshape(-1), slot[:, 0, :].reshape(-1)


# ---------------------------------------------------------------------------
# Driver: windowed passes to exactness
# ---------------------------------------------------------------------------

def _scene_bounds(tl):
    if "scene_lo" in tl:
        return tl["scene_lo"], tl["scene_hi"]
    return tl["bmin"].min(axis=0), tl["bmax"].max(axis=0)


def _wsup(tl, super_g: int):
    wp = tl["wplanes"]
    t, rows, k = wp.shape
    return wp.reshape(t // super_g, super_g * rows, k)


def _process_window(cand, rows8, n: int, t_s: int, c_max: int, wsup,
                    super_g: int, k_size: int, config: RenderConfig,
                    any_hit: bool):
    """Expand one (N, c_max) candidate window into pairs, run the kernel on
    a budget-sliced pair list, and combine back to per-ray results.

    Returns (t_row, s_row, truncated): per-ray best (t, slot) over the
    PROCESSED pairs, and a mask of rays that had real candidates cut off by
    the pair budget (their window must be retried — their results here are
    only partial, which is safe: t/slot commits monotonically).
    """
    pair_sid, pair_flat = expand_pairs(cand, t_s)
    p = pair_sid.shape[0]                       # == n * c_max
    b = min(p, max(n * PAIR_BUDGET, PBLOCK))
    sid_b = pair_sid[:b]
    flat_b = pair_flat[:b]
    padp = (-b) % PBLOCK
    if padp:
        sid_b = jnp.concatenate([sid_b, jnp.full(padp, t_s, jnp.int32)])
        flat_b = jnp.concatenate(
            [flat_b, p + jnp.arange(padp, dtype=jnp.int32)])
    visits, nvisit = block_visit_lists(sid_b, t_s)

    live = (sid_b < t_s)[:, None]
    pair_ray = jnp.minimum(flat_b // c_max, n - 1)
    pr8 = jnp.where(live, rows8[pair_ray], 0.0)            # (B, 8)
    # super id rides in lane-major row 7 (exact-int f32) — a (B, 1) i32
    # operand would be lane-padded 128x in HBM (OOM at 1M-ray launches)
    pr8 = pr8.at[:, 7].set(sid_b.astype(jnp.float32))
    nb = pr8.shape[0] // PBLOCK
    rays8 = pr8.reshape(nb, PBLOCK, 8).transpose(0, 2, 1).reshape(
        nb * 8, PBLOCK)
    t_pair, slot_pair = _run_pair_kernel(
        rays8, visits, nvisit, wsup,
        super_g, k_size, float(config.t_epsilon), any_hit)

    # reconstitute the full pair range for the combine: slots beyond the
    # budget are marked -2 (unprocessed) — distinct from -1 (no hit)
    t_full = jnp.concatenate([t_pair[:b], jnp.full(p - b, BIG_T)])
    s_full = jnp.concatenate(
        [slot_pair[:b], jnp.full(p - b, -2, jnp.int32)])
    # combine: sort results back to (N, c_max) pre-expansion order
    # (scatter-free inverse of the pair sort), then reduce per row
    _, t_back, s_back = jax.lax.sort(
        (pair_flat, t_full, s_full), num_keys=1, is_stable=True)
    s_mat = s_back.reshape(n, c_max)
    t_mat = jnp.where(s_mat >= 0, t_back.reshape(n, c_max), BIG_T)
    kmin = jnp.argmin(t_mat, axis=1)
    t_row = jnp.take_along_axis(t_mat, kmin[:, None], axis=1)[:, 0]
    s_row = jnp.take_along_axis(s_mat, kmin[:, None], axis=1)[:, 0]
    s_row = jnp.maximum(s_row, -1)              # -2 cell won at argmin ⇒ miss
    truncated = jnp.any((s_mat == -2) & (cand < t_s), axis=1)
    return t_row, s_row, truncated


def _trace(scene, origins, directions, t_max, config: RenderConfig,
           any_hit: bool, super_g: int = 8):
    """Two-phase driver. Returns per-ray (t, slot) in given order.

    Phase A — enumerate ONCE: the nearest C_KEEP candidate supers per ray
    (one (N, T_s) slab map + row sort), then iterate C_MAX-wide windows
    over the CACHED keys with a per-ray window pointer. Each window pays
    only the pair sort + budget-sliced kernel + combine; re-enumeration
    (82 ms of each 361 ms pass at 518k rays) is gone. The best-t horizon
    filters cached keys before expansion, so hits still terminate early.

    Phase B — legacy windowed re-enumeration for the rare rays whose
    crossing count exceeds C_KEEP (measured max 62 on the bench bounce
    workload) or that exhausted A_MAX retries.

    No ray sorting: the global pair sort by sid fully determines kernel
    block composition, so ray order is irrelevant here (unlike the
    envelope kernel, which needs octant+Morton blocks)."""
    tl = scene["treelets"]
    k_size = int(tl["wplanes"].shape[2])
    t_s = int(tl["sbmin"].shape[0])
    sb = _sid_bits(t_s)
    n = origins.shape[0]
    c_max = min(C_MAX, max(t_s, 1))
    c_keep = min(C_KEEP, max(t_s, 1))
    wsup = _wsup(tl, super_g)
    lo, hi = _scene_bounds(tl)
    gran = jnp.sqrt(jnp.sum((hi - lo) ** 2)) / ((1 << _qbits(t_s)) - 1)
    zeros1 = jnp.zeros((n, 1), jnp.float32)
    t_max = jnp.asarray(t_max, jnp.float32)

    # ---- phase A ----
    c_keep = c_max * max(1, c_keep // c_max)    # whole windows
    n_win = c_keep // c_max
    _, keys_all, count, _ = ray_super_candidates(
        origins, directions, t_max, jnp.zeros(n, jnp.float32), tl,
        c_max=c_keep)
    count_capped = jnp.minimum(count, c_keep)
    keys_win = keys_all.reshape(n, n_win, c_max)
    col = jnp.arange(c_max, dtype=jnp.int32)[None, :]
    win_ids = jnp.arange(n_win, dtype=jnp.int32)[None, :]

    def _window_keys(wi):
        """Per-ray window wi (N,) → its c_max keys, via a one-hot select
        over the n_win cached windows — NO gather (per-row gathers cost
        ~50x the arithmetic they feed on TPU; wptr only ever moves in
        whole windows, so a one-hot contraction is exact)."""
        oh = (win_ids == wi[:, None]).astype(keys_all.dtype)  # (N, n_win)
        return jnp.einsum("nw,nwc->nc", oh, keys_win)

    def body_a(state):
        it, wptr, best_t, best_slot, finished = state
        t_hi = jnp.minimum(t_max, best_t)
        if any_hit:
            t_hi = jnp.where(best_slot >= 0, 0.0, t_hi)
        wi = jnp.minimum(wptr // c_max, n_win - 1)
        keys_w = _window_keys(wi)
        pos = wptr[:, None] + col
        lb = jnp.floor(keys_w / (1 << sb)) * gran
        valid = ((pos < count_capped[:, None]) & (keys_w < _BIGKEY)
                 & (lb < t_hi[:, None]) & ~finished[:, None])
        cand_w = jnp.where(
            valid, keys_w.astype(jnp.int32) & ((1 << sb) - 1), t_s)
        rows8 = jnp.concatenate(
            [origins, t_hi[:, None], directions, zeros1], axis=1)
        t_row, s_row, truncated = _process_window(
            cand_w, rows8, n, t_s, c_max, wsup, super_g, k_size, config,
            any_hit)
        better = t_row < best_t
        new_t = jnp.where(better, t_row, best_t)
        new_slot = jnp.where(better, s_row, best_slot)

        advance = ~truncated & ~finished
        new_wptr = jnp.where(advance,
                             jnp.minimum(wptr + c_max, c_keep), wptr)
        # front-to-back exit: next unprocessed key's entry lower bound is
        # already past the best hit (pads carry _BIGKEY ⇒ huge bound)
        key_next = _window_keys(
            jnp.minimum(new_wptr // c_max, n_win - 1))[:, 0]
        key_next = jnp.where(new_wptr >= c_keep, _BIGKEY, key_next)
        # key_next == _BIGKEY means "unknown / pad": no front-to-back exit
        # from it (conservative); rays that also processed every REAL kept
        # key finish via `exhausted` below, and > c_keep-crossing rays fall
        # to phase B, whose first pass re-enumerates within best_t.
        beyond = ((key_next < _BIGKEY)
                  & (new_t <= jnp.floor(key_next / (1 << sb)) * gran))
        exhausted = (new_wptr >= count_capped) & (count <= c_keep)
        fin = finished | (advance & (exhausted | beyond))
        if any_hit:
            fin = fin | (new_slot >= 0)
        return it + 1, new_wptr, new_t, new_slot, fin

    def cond_a(state):
        it, _, _, _, finished = state
        return (it < A_MAX) & ~jnp.all(finished)

    state_a = (jnp.int32(0), jnp.zeros(n, jnp.int32), t_max,
               jnp.full(n, -1, jnp.int32), count_capped == 0)
    _, wptr, best_t, best_slot, finished = jax.lax.while_loop(
        cond_a, body_a, state_a)

    # ---- phase B (rare: > C_KEEP crossings or A_MAX exhausted) ----
    key_at = jnp.take_along_axis(
        keys_all, jnp.minimum(wptr, c_keep - 1)[:, None], axis=1)[:, 0]
    win_b = jnp.where(
        finished, _BIGKEY,
        jnp.where(wptr >= c_keep, keys_all[:, -1] + 1.0, key_at))

    def one_pass(state):
        it, win, best_t, best_slot, _ = state
        t_hi = jnp.minimum(t_max, best_t)
        if any_hit:
            t_hi = jnp.where(best_slot >= 0, 0.0, t_hi)
        cand, keys, count, complete = ray_super_candidates(
            origins, directions, t_hi, win, tl, c_max=c_max)
        rows8 = jnp.concatenate([
            origins, t_hi[:, None], directions, zeros1], axis=1)   # (N, 8)
        t_row, s_row, truncated = _process_window(
            cand, rows8, n, t_s, c_max, wsup, super_g, k_size, config,
            any_hit)
        better = t_row < best_t
        new_t = jnp.where(better, t_row, best_t)
        new_slot = jnp.where(better, s_row, best_slot)

        # finished: enumeration complete, or every unprocessed candidate's
        # entry lower bound (floor-quantized → q·gran ≤ entry) is beyond
        # the best hit — the front-to-back early exit across passes.
        # Budget-truncated rays are neither finished nor advanced: they
        # re-run the same window (results committed so far are partial but
        # monotone) until the shrinking horizon fits the budget.
        beyond = new_t <= jnp.floor(keys[:, -1] / (1 << sb)) * gran
        finished = (complete | (count == 0) | beyond) & ~truncated
        # watermark: one past the last enumerated key (keys unique → exact)
        new_win = jnp.where(
            finished, _BIGKEY,
            jnp.where(truncated, win, keys[:, -1] + 1.0))
        if any_hit:
            finished = finished | (new_slot >= 0)
        return it + 1, new_win, new_t, new_slot, finished

    def cond(state):
        it, _, _, _, finished = state
        return (it < MAX_PASSES) & ~jnp.all(finished)

    state = (jnp.int32(0), win_b, best_t, best_slot, finished)
    _, _, t, slot, fin_b = jax.lax.while_loop(cond, one_pass, state)
    if config.debug_checks:
        # Truncation visibility (ADVICE r1): a ray that exhausted
        # A_MAX/MAX_PASSES while still pair-budget-truncated returns
        # partial results. Surface a counter instead of staying silent.
        def _warn(n_bad):
            if int(n_bad) > 0:
                from ..utils import logger
                logger.warning(
                    "pair driver: %d rays exited with truncated "
                    "traversal (partial results)", int(n_bad))
        jax.debug.callback(_warn, jnp.sum(~fin_b))
    return t, slot


def closest_hit(scene, origins, directions, config: RenderConfig,
                t_max=None, sort: bool = True):
    """Intersector ABI: (t, prim, u, v); lanes with t_max == 0 are dead.

    ``sort`` is accepted for ABI parity but unused: the global pair sort
    fully determines kernel block composition, so pre-sorting rays buys
    nothing here (measured: it cost ~80 ms/stage at 518k rays)."""
    del sort
    tl = scene["treelets"]
    n = origins.shape[0]
    if t_max is None:
        t_max = jnp.full(n, BIG_T)
    t_max = jnp.broadcast_to(t_max, (n,))
    inv = slice(None)
    t, slot = _trace(scene, origins, directions, t_max, config,
                     any_hit=False)
    found = slot >= 0
    prim = jnp.where(found, tl["slot_to_prim"][jnp.maximum(slot, 0)], -1)
    found = found & (prim >= 0)

    # Möller–Trumbore refinement of the winner (exact-f32 precision;
    # see ops/pallas_intersect.py module doc)
    tv = tl["verts"][jnp.maximum(slot, 0)]
    rhit, rt, ru, rv = intersect_tri(
        origins, directions, tv[:, 0], tv[:, 1] - tv[:, 0],
        tv[:, 2] - tv[:, 0], t_epsilon=config.t_epsilon * 0.5)
    t = jnp.where(found & rhit, rt, t)
    u = jnp.where(found & rhit, ru, 0.0)
    v = jnp.where(found & rhit, rv, 0.0)
    return (jnp.where(found, t, BIG_T)[inv], jnp.where(found, prim, -1)[inv],
            u[inv], v[inv])


def any_hit(scene, origins, directions, dist, config: RenderConfig,
            sort: bool = True):
    """Occlusion: True where something lies closer than ``dist``.
    ``sort`` unused (see closest_hit)."""
    del sort
    tl = scene["treelets"]
    n = origins.shape[0]
    dist = jnp.broadcast_to(dist, (n,))
    inv = slice(None)
    _, slot = _trace(scene, origins, directions, dist, config, any_hit=True)
    hit = slot >= 0
    prim = jnp.where(hit, tl["slot_to_prim"][jnp.maximum(slot, 0)], -1)
    return (prim >= 0)[inv]
