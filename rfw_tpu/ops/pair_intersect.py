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
4. **Combine (XLA)**: segment-min over pair rays; unfinished rays loop
   (a lax.while that runs one pass for hitting rays; sky/miss rays take
   ~ceil(crossings/C_MAX) passes since nothing bounds their traversal).

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .intersect import BIG_T, intersect_tri, safe_inv_dir

PBLOCK = 512       # pairs per kernel program
C_MAX = 24         # candidate supers enumerated per ray per pass. Each
#                    windowed pass pays fixed sort costs, so fatter passes
#                    win until the pair-sort size dominates: bench bounce
#                    closest 807/701/651/761 ms at 8/16/24/32
#                    (tools/cmax_sweep.py, 518k scattered rays, pica-4x)
PIPE = 4           # in-flight super DMAs
MAX_PASSES = 64    # hard bound on windowed passes (termination guard)
_BIGKEY = jnp.float32(1 << 25)   # > any packed (q, sid) key


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
                 rays_ref,               # (8, PBLOCK) ox,oy,oz,tmax,dx,dy,dz,0
                 sid_ref,                # (PBLOCK, 1) pair super ids
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
    my_sid = sid_ref[:]                       # (PBLOCK, 1) int32
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
def _run_pair_kernel(rays8, sid_col, visits, nvisit, wsup,
                     super_g: int, k_size: int, t_epsilon: float,
                     any_hit: bool, use_skip: bool = False):
    """rays8 (NB*8, PBLOCK); sid_col (NB*PBLOCK, 1); visits (NB, D);
    nvisit (NB,). Returns per-pair (t (P,), slot (P,))."""
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
        pl.BlockSpec((PBLOCK, 1), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
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
    )(visits, nvisit.reshape(-1, 1), rays8, sid_col, wsup)
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


def _trace(scene, origins, directions, t_max, config: RenderConfig,
           any_hit: bool, super_g: int = 8):
    """Windowed pass loop. Returns per-ray (t, slot) in given order.

    No ray sorting: the global pair sort by sid fully determines kernel
    block composition, so ray order is irrelevant here (unlike the
    envelope kernel, which needs octant+Morton blocks)."""
    tl = scene["treelets"]
    k_size = int(tl["wplanes"].shape[2])
    t_s = int(tl["sbmin"].shape[0])
    sb = _sid_bits(t_s)
    n = origins.shape[0]
    c_max = min(C_MAX, max(t_s, 1))
    wsup = _wsup(tl, super_g)
    lo, hi = _scene_bounds(tl)
    gran = jnp.sqrt(jnp.sum((hi - lo) ** 2)) / ((1 << _qbits(t_s)) - 1)

    def one_pass(state):
        it, win, best_t, best_slot, _ = state
        t_hi = jnp.minimum(t_max, best_t)
        if any_hit:
            t_hi = jnp.where(best_slot >= 0, 0.0, t_hi)
        cand, keys, count, complete = ray_super_candidates(
            origins, directions, t_hi, win, tl, c_max=c_max)
        pair_sid, pair_flat = expand_pairs(cand, t_s)
        p_real = pair_sid.shape[0]
        padp = (-p_real) % PBLOCK
        if padp:   # tiny scenes (t_s < C_MAX) or tiny ray counts
            pair_sid = jnp.concatenate(
                [pair_sid, jnp.full(padp, t_s, jnp.int32)])
            # pad flats beyond the real range so the combine's sort-back
            # keeps them past the [:n*c_max] slice
            pair_flat = jnp.concatenate(
                [pair_flat,
                 p_real + jnp.arange(padp, dtype=jnp.int32)])
        visits, nvisit = block_visit_lists(pair_sid, t_s)

        rows8 = jnp.concatenate([
            origins, t_hi[:, None], directions,
            jnp.zeros((n, 1), jnp.float32)], axis=1)       # (N, 8)
        live = (pair_sid < t_s)[:, None]
        pair_ray = pair_flat // c_max
        pr8 = jnp.where(live, rows8[pair_ray], 0.0)        # (P, 8)
        nb = pr8.shape[0] // PBLOCK
        rays8 = pr8.reshape(nb, PBLOCK, 8).transpose(0, 2, 1).reshape(
            nb * 8, PBLOCK)
        t_pair, slot_pair = _run_pair_kernel(
            rays8, pair_sid.reshape(-1, 1), visits, nvisit, wsup,
            super_g, k_size, float(config.t_epsilon), any_hit)

        # combine: sort results back to (N, c_max) pre-expansion order
        # (scatter-free inverse of the pair sort), then reduce per row
        _, t_back, s_back = jax.lax.sort(
            (pair_flat, t_pair, slot_pair), num_keys=1, is_stable=True)
        t_mat = jnp.where(s_back[:n * c_max].reshape(n, c_max) >= 0,
                          t_back[:n * c_max].reshape(n, c_max), BIG_T)
        kmin = jnp.argmin(t_mat, axis=1)
        t_row = jnp.take_along_axis(t_mat, kmin[:, None], axis=1)[:, 0]
        s_row = jnp.take_along_axis(
            s_back[:n * c_max].reshape(n, c_max), kmin[:, None],
            axis=1)[:, 0]
        better = t_row < best_t
        new_t = jnp.where(better, t_row, best_t)
        new_slot = jnp.where(better, s_row, best_slot)

        # finished: enumeration complete, or every unprocessed candidate's
        # entry lower bound (floor-quantized → q·gran ≤ entry) is beyond
        # the best hit — the front-to-back early exit across passes
        beyond = new_t <= jnp.floor(keys[:, -1] / (1 << sb)) * gran
        finished = complete | (count == 0) | beyond
        # watermark: one past the last enumerated key (keys unique → exact)
        new_win = jnp.where(finished, _BIGKEY, keys[:, -1] + 1.0)
        if any_hit:
            finished = finished | (new_slot >= 0)
        return it + 1, new_win, new_t, new_slot, finished

    def cond(state):
        it, _, _, _, finished = state
        return (it < MAX_PASSES) & ~jnp.all(finished)

    state = (jnp.int32(0), jnp.zeros(n, jnp.float32),
             jnp.asarray(t_max, jnp.float32),
             jnp.full(n, -1, jnp.int32), jnp.zeros(n, bool))
    _, _, t, slot, _ = jax.lax.while_loop(cond, one_pass, state)
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
