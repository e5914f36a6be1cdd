"""Transposed sub-cell visit-list intersector — the round-5 post-visit
CANDIDATE, kept as a parity-tested NEGATIVE RESULT.

OUTCOME (on chip, tools/r5_tvisit_ab.py, 2026-08-20): loses to the
production visit kernel on every stream — d1 bounce closest 473 vs 271
ms, d1 occlusion 331 vs 196, coherent primary 78 vs 41 — at perfect
correctness (found-mask agreement 1.000000). The 3.4x dense-work
reduction this design achieves is fully consumed by the measured
~0.33 us per-visit DMA/step overhead (74% of a (32,128) visit's cost)
plus ~100 ms/chunk of child-expansion machinery. The full
measured-constants analysis — why no TPU-expressible design beats the
visit architecture on this hardware, and which missing primitives
would change that — is in STATUS.md round-5. The design, for the
record:

The production visit kernel (ops/visit_intersect.py) is capped by its own
speed-of-light budget at ~23 Mrays/s: per-256-ray-block union visit
lists execute ~97-133 (256,128) dense visits on the 1080p bounce stream
against a per-ray floor of ~12, and every block-formation lever is a
recorded kill (STATUS.md r2-r4) because the waste is hemisphere
direction scatter within origin-coherent blocks. Per-ray pair expansion
removes the union waste but pays O(pairs) global sorts (~3-7 ms per
M-row per operand) that cancel the win — measured r2, re-priced with
on-chip constants in r5 (tools/r5_table_micro.py).

This design attacks the waste with ZERO new table classes, on two axes:

* **Finer rays**: each 256-ray block splits into SUB=2 sub-blocks of 128
  rays with their OWN visit lists. Union(128 rays) < union(256): the
  r5 sim measures exec 52 vs 80 visits (640x360 d1 stream, K=128).
* **Finer cells**: candidates are K/4 = 32-triangle CHILD cells
  (bvh/wide.subdivide_cells — an in-place spatial reorder of each cell's
  slots, so child j of cell c owns slots [c*128+32j, +32) and the rest
  of the framework is untouched). Crossing counts barely grow with
  4x finer cells (sim: 17.0 → 18.5 crossings/ray), so dense tests/ray
  drop ~4x.

The kernel is TRANSPOSED to make (K=32)-cell visits cheap: cell
triangles live on SUBLANES, the sub-block's 128 rays on LANES, so one
visit is a (32, 128) = 4k-slot dense op (vs 32k for (256,128)) with a
2 KB contiguous DMA. Plane columns broadcast over lanes, ray rows over
sublanes — the same outer-FMA pattern as the production kernel with the
roles swapped (Mosaic-friendly; measured in tools/r5_tkernel_micro.py).

Candidate structure is TWO-LEVEL, reusing the production parent
machinery verbatim: parent (K=128) windows come from block_entries +
sort_candidates (geometric keys, windowed recull passes — exactness
contract unchanged, visit_intersect.sort_candidates docstring); each
window's ≤128 parents expand to ≤512 child slots, slab-tested per ray
and reduced per SUB-BLOCK, then entry-sorted per sub-block with a cheap
(NB*2, 512) row sort. Parent entries lower-bound their children's, so
the cross-window front-to-back exit stays exact.

Cited reference workload: per-ray ordered MBVH traversal
(/root/reference/RFW/system/bvh/mbvh_node.h:122-307,
/root/reference/RFW/backends/CUDART/src/CUDAIntersect.h) — approximated
here at sub-block granularity with dense lockstep visits.
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
from .visit_intersect import (BLOCK, M_C, _pack_rays8, _pad_rays,
                              _sort_carry_in, _sort_carry_out,
                              block_entries, block_entries_envelope,
                              sort_candidates, window_candidates)

SUB = 2            # sub-blocks per 256-ray program (128 rays on lanes)
LANES = BLOCK // SUB
CSLOTS = 4 * M_C   # child slots per parent window (4 children/parent)
PIPE = 8
EXIT_EVERY = 4
_BIGKEY = np.float32(1 << 25)


# ---------------------------------------------------------------------------
# Child expansion: parent window → per-sub-block entry-sorted child lists
# ---------------------------------------------------------------------------

def expand_children(ids, origins, directions, t_hi, bmin32, bmax32,
                    diag, t_p: int):
    """Parent window ids (NB, M_C) → per-SUB-BLOCK child visit lists.

    Slab-tests every ray of each sub-block against the 4*M_C child AABBs
    of its block's window parents (chunked over blocks to bound the
    (NBc, 256, 512) transient), reduces crossed/entry per sub-block, and
    row-sorts packed (quantized-entry, slot) keys — (NB*SUB, 512) rows,
    ~25x cheaper per element than the flat sorts that killed the pair
    drivers.

    Returns (cids, counts, tnears): global child ids (NB*SUB, CSLOTS,
    invalid = t32), live counts, and entry lower bounds (BIG_T pad).
    """
    nb = ids.shape[0]
    n = origins.shape[0]
    m_p = ids.shape[1]
    cslots = 4 * m_p
    t32 = 4 * t_p
    # global child ids of the window: (NB, 4*M_C); invalid parents → t32
    valid_p = ids < t_p
    cid = (jnp.minimum(ids, t_p - 1)[:, :, None] * 4
           + jnp.arange(4, dtype=ids.dtype)[None, None, :])
    cid = jnp.where(valid_p[:, :, None], cid, t32).reshape(nb, cslots)
    # child bounds gather: one (NB*4*M_C)-row gather of 6-float rows.
    # Invalid slots (cid == t32) must get a far-point box, NOT the
    # clamped last real child's: when the padded cell count equals the
    # real count (power-of-two scenes), child t32-1 is real and every
    # non-full window would inject phantom duplicate visits of it.
    cb = jnp.concatenate([bmin32, bmax32], axis=1)        # (T32, 6)
    cbw = cb[jnp.minimum(cid, t32 - 1).reshape(-1)].reshape(
        nb, cslots, 6)
    cbw = jnp.where((cid < t32)[:, :, None], cbw, 3e37)

    o_b = origins.reshape(nb, BLOCK, 3)
    d_b = directions.reshape(nb, BLOCK, 3)
    th_b = t_hi.reshape(nb, BLOCK)

    nbc = 256                        # blocks per slab chunk (~128 MB)
    pad_nb = (-nb) % nbc
    if pad_nb:
        o_b = jnp.pad(o_b, ((0, pad_nb), (0, 0), (0, 0)))
        d_b = jnp.pad(d_b, ((0, pad_nb), (0, 0), (0, 0)),
                      constant_values=1.0)
        th_b = jnp.pad(th_b, ((0, pad_nb), (0, 0)))
        cbw = jnp.pad(cbw, ((0, pad_nb), (0, 0), (0, 0)),
                      constant_values=3e37)

    def chunk_fn(args):
        o_c, d_c, th_c, cb_c = args                       # (nbc, ...)
        inv = safe_inv_dir(d_c)[:, :, None, :]            # (nbc,B,1,3)
        lo = cb_c[:, None, :, 0:3]                        # (nbc,1,S,3)
        hi = cb_c[:, None, :, 3:6]
        t1 = (lo - o_c[:, :, None, :]) * inv
        t2 = (hi - o_c[:, :, None, :]) * inv
        ent = jnp.maximum(jnp.max(jnp.minimum(t1, t2), axis=-1), 0.0)
        ext = jnp.min(jnp.maximum(t1, t2), axis=-1)       # (nbc,B,S)
        crossed = ent < jnp.minimum(ext, th_c[:, :, None])
        e = jnp.where(crossed, ent, 1e30)
        # per-sub-block min entry: (nbc, SUB, S)
        e_sub = e.reshape(nbc, SUB, LANES, cslots).min(axis=2)
        return e_sub

    n_chunks = (nb + pad_nb) // nbc
    e_sub = jax.lax.map(chunk_fn, (
        o_b.reshape(n_chunks, nbc, BLOCK, 3),
        d_b.reshape(n_chunks, nbc, BLOCK, 3),
        th_b.reshape(n_chunks, nbc, BLOCK),
        cbw.reshape(n_chunks, nbc, cslots, 6)))
    e_sub = e_sub.reshape(-1, SUB, cslots)[:nb].reshape(
        nb * SUB, cslots)

    # entry-sorted child lists per sub-block: packed exact-int f32 keys
    # (quantized entry | slot). 9 slot bits at CSLOTS=512 → 15 entry bits
    sb = max((cslots - 1).bit_length(), 1)
    qmax = (1 << (24 - sb)) - 1
    q = jnp.clip(jnp.floor(e_sub * (qmax / diag)), 0.0, float(qmax))
    slot_f = jnp.arange(cslots, dtype=jnp.float32)[None]
    key = jnp.where(e_sub < BIG_T, q * (1 << sb) + slot_f, _BIGKEY)
    keys = jax.lax.sort(key, dimension=-1)
    counts = jnp.sum(key < _BIGKEY, axis=-1).astype(jnp.int32)
    slot_srt = jnp.where(keys < _BIGKEY,
                         keys.astype(jnp.int32) & ((1 << sb) - 1), 0)
    # slot → global child id (per block, shared by its SUB rows)
    cid_sub = jnp.repeat(cid, SUB, axis=0)                # (NB*SUB, S)
    cids = jnp.where(keys < _BIGKEY,
                     jnp.take_along_axis(cid_sub, slot_srt, axis=1), t32)
    gran = diag / qmax
    tnears = jnp.where(keys < _BIGKEY,
                       jnp.floor(keys / (1 << sb)) * gran, BIG_T)
    return cids, counts, tnears


# ---------------------------------------------------------------------------
# The transposed kernel
# ---------------------------------------------------------------------------

def _tvisit_kernel(k_size: int, cslots: int, t_epsilon: float,
                   any_hit: bool,
                   # SMEM — (8*SUB, cslots) windows shared by 8 grid rows
                   # (SMEM block rows must be divisible by 8; each program
                   # owns rows 2*(b%8) and 2*(b%8)+1 — the production
                   # kernel's b//8 packing pattern)
                   cids_ref, counts_ref, tnears_ref,
                   # VMEM
                   rays_ref,                           # (8, BLOCK)
                   wg_hbm,                             # (T32, 16, 128)
                   # outputs
                   t_out, slot_out,
                   # scratch
                   bt_s, bs_s, wp_s, sems):
    """Per sub-block: walk its entry-sorted child list front-to-back; per
    visit DMA one child's (16, K) plane block and dense-test its K
    triangles (sublanes) against the sub-block's 128 rays (lanes).
    Commit is a per-lane running min over the K-sublane reduction of each
    visit. Sub-blocks advance in lockstep; a finished sub-block's visits
    are skipped (pl.when), so total dense work is the SUM of the two
    lists, not twice the straggler."""
    rays = rays_ref[:]
    rbase = SUB * jnp.remainder(pl.program_id(0), 8)

    def nrow(sub):
        return counts_ref[rbase + sub, 0]

    def gid(sub, i):
        j = jnp.clip(jnp.minimum(i, nrow(sub) - 1), 0, cslots - 1)
        return jnp.minimum(cids_ref[rbase + sub, j], wg_hbm.shape[0] - 1)

    def tnear_of(sub, i):
        return tnears_ref[rbase + sub, jnp.minimum(i, cslots - 1)]

    def dma(sub, slot, g):
        return pltpu.make_async_copy(
            wg_hbm.at[g], wp_s.at[sub, slot], sems.at[sub, slot])

    for sub in range(SUB):
        bt_s[sub * 8:sub * 8 + 1, :] = rays[3:4,
                                            sub * LANES:(sub + 1) * LANES]
        bs_s[sub * 8:sub * 8 + 1, :] = jnp.full((1, LANES), -1, jnp.int32)
        for k in range(PIPE - 1):
            @pl.when(k < nrow(sub))
            def _(sub=sub, k=k):
                dma(sub, k, gid(sub, k)).start()

    def body(state):
        i, *done_v = state      # scalar bool per sub (vector carries are
        #                         Mosaic-fragile; SUB is static)
        slot = jnp.remainder(i, PIPE)
        new_done = []
        for sub in range(SUB):
            n_sub = nrow(sub)
            lane0 = sub * LANES
            done_s = done_v[sub]
            live = (~done_s) & (i < n_sub)

            # DMA start/wait are gated ONLY by the list bound, NOT by
            # done_s: a sub that early-exits while its sibling continues
            # must keep consuming its own DMA ring, or its in-flight
            # copies end the kernel with unsignaled semaphores — the
            # global drain below uses the LOCKSTEP exit step, which only
            # matches what was started if starts never pause. (First
            # version gated starts on done_s: deterministic TPU-worker
            # watchdog kill at first execution.) Only the dense compute
            # is skipped for a finished sub.
            @pl.when(i + PIPE - 1 < n_sub)
            def _(sub=sub):
                dma(sub, jnp.remainder(i + PIPE - 1, PIPE),
                    gid(sub, i + PIPE - 1)).start()

            @pl.when(i < n_sub)
            def _(sub=sub, slot=slot):
                dma(sub, slot, gid(sub, i)).wait()

            @pl.when(live)
            def _(sub=sub, lane0=lane0, slot=slot):
                wp = wp_s[sub, slot]                     # (16, 128)
                o_rows = rays[0:3, lane0:lane0 + LANES]  # (3, LANES)
                d_rows = rays[4:7, lane0:lane0 + LANES]

                def col(c):
                    # (1,128) row → transpose (full lane width — Mosaic
                    # allows it) → STATIC sublane slice to the child's
                    # k_size tris (sublane slices need only 8-alignment;
                    # lane slices would need 128)
                    return wp[c:c + 1, :].T[0:k_size]    # (k_size, 1)

                def xf_o(c0):
                    a = col(c0 + 3) + col(c0) * o_rows[0:1, :]
                    for q in range(1, 3):
                        a = a + col(c0 + q) * o_rows[q:q + 1, :]
                    return a                             # (k, LANES)

                def xf_d(c0):
                    a = col(c0) * d_rows[0:1, :]
                    for q in range(1, 3):
                        a = a + col(c0 + q) * d_rows[q:q + 1, :]
                    return a

                ou, du = xf_o(0), xf_d(0)
                ov, dv = xf_o(4), xf_d(4)
                ow, dw = xf_o(8), xf_d(8)
                valid = jnp.abs(dw) > 1e-12
                t = -ow / jnp.where(valid, dw, 1.0)
                u = ou + t * du
                v = ov + t * dv
                hit = (valid & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > t_epsilon))
                t_hit = jnp.where(hit, t, 1e30)          # (k, LANES)
                tmin = jnp.min(t_hit, axis=0, keepdims=True)
                kmin = jnp.argmin(t_hit, axis=0,
                                  keepdims=True).astype(jnp.int32)
                bt = bt_s[sub * 8:sub * 8 + 1, :]
                upd = tmin < bt                          # strict: first wins
                bt_s[sub * 8:sub * 8 + 1, :] = jnp.where(upd, tmin, bt)
                bs_s[sub * 8:sub * 8 + 1, :] = jnp.where(
                    upd, gid(sub, i) * k_size + kmin,
                    bs_s[sub * 8:sub * 8 + 1, :])

            def check(sub=sub, lane0=lane0):
                bt = bt_s[sub * 8:sub * 8 + 1, :]
                tm0 = rays[3:4, lane0:lane0 + LANES]
                if any_hit:
                    d_s = ~jnp.any((bt >= tm0) & (tm0 > 0))
                else:
                    d_s = jnp.max(bt) <= tnear_of(sub, i + 1)
                return d_s

            do_chk = live & (jnp.remainder(i, EXIT_EVERY)
                             == EXIT_EVERY - 1)
            fin = jax.lax.cond(do_chk, check, lambda: jnp.bool_(False))
            new_done.append(done_s | fin | (i + 1 >= nrow(sub)))
        return (i + 1, *new_done)

    def cond(state):
        done_v = state[1:]
        acc = done_v[0]
        for d_s in done_v[1:]:
            acc = acc & d_s
        return ~acc

    out_state = jax.lax.while_loop(
        cond, body, (jnp.int32(0),) + (jnp.bool_(False),) * SUB)
    i_end = out_state[0]

    for sub in range(SUB):   # drain in-flight DMAs on early exit
        for k in range(PIPE - 1):
            @pl.when(i_end + k < nrow(sub))
            def _(sub=sub, k=k):
                dma(sub, jnp.remainder(i_end + k, PIPE),
                    gid(sub, i_end + k)).wait()

    t_rows = jnp.concatenate(
        [bt_s[sub * 8:sub * 8 + 1, :] for sub in range(SUB)], axis=1)
    s_rows = jnp.concatenate(
        [bs_s[sub * 8:sub * 8 + 1, :] for sub in range(SUB)], axis=1)
    found = t_rows < rays[3:4, :]
    t_out[0, :, :] = jnp.broadcast_to(
        jnp.where(found, t_rows, rays[3:4, :]), (8, BLOCK))
    slot_out[0, :, :] = jnp.broadcast_to(
        jnp.where(found, s_rows, -1), (8, BLOCK))


@functools.partial(jax.jit, static_argnames=("k_size", "t_epsilon",
                                             "any_hit"))
def _run_tvisit_kernel(rays8, cids, counts, tnears, wg32,
                       k_size: int, t_epsilon: float, any_hit: bool):
    """rays8 (NB*8, BLOCK); cids/tnears (NB*SUB, CSLOTS); counts
    (NB*SUB,). Returns per-ray (t, slot) in block-ray order."""
    nb = cids.shape[0] // SUB
    cslots = cids.shape[1]
    # SMEM block rows must be divisible by 8 → 8 programs share one
    # (8*SUB, cslots) window; each reads its rows 2*(b%8), 2*(b%8)+1
    # (the production kernel's b//8 packing). Pad NB to a multiple of 8.
    pad_nb = (-nb) % 8
    if pad_nb:
        cids = jnp.pad(cids, ((0, pad_nb * SUB), (0, 0)))
        counts = jnp.pad(counts, (0, pad_nb * SUB))
        tnears = jnp.pad(tnears, ((0, pad_nb * SUB), (0, 0)))
        rays8 = jnp.pad(rays8, ((0, pad_nb * 8), (0, 0)))
    in_specs = [
        pl.BlockSpec((8 * SUB, cslots), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8 * SUB, 1), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8 * SUB, cslots), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, BLOCK), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_tvisit_kernel, k_size, cslots,
                               t_epsilon, any_hit)
    interpret = jax.default_backend() == "cpu"
    t, slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nb + pad_nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        scratch_shapes=[
            pltpu.VMEM((SUB * 8, LANES), jnp.float32),
            pltpu.VMEM((SUB * 8, LANES), jnp.int32),
            pltpu.VMEM((SUB, PIPE, 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((SUB, PIPE)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb + pad_nb, 8, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb + pad_nb, 8, BLOCK), jnp.int32),
        ],
    )(cids, counts.reshape(-1, 1), tnears, rays8, wg32)
    return (t[:nb, 0, :].reshape(-1), slot[:nb, 0, :].reshape(-1))


# ---------------------------------------------------------------------------
# Driver (parent windows verbatim from visit_intersect)
# ---------------------------------------------------------------------------

def _trace(scene, origins, directions, t_max, config: RenderConfig,
           any_hit: bool, coherent: bool = False):
    tl = scene["treelets"]
    bounds8 = jnp.concatenate([
        tl["bmin"].T, tl["bmax"].T,
        jnp.zeros((2, tl["bmin"].shape[0]), jnp.float32)], axis=0)
    n = origins.shape[0]
    t_p = bounds8.shape[1]
    # child tri count from static shapes (wplanes32 blocks are
    # lane-padded to 128, so their lane dim can't serve)
    k32 = int(tl["slot_to_prim"].shape[0]) // int(tl["bmin32"].shape[0])
    t_max = jnp.asarray(t_max, jnp.float32)
    lo = tl["scene_lo"] if "scene_lo" in tl else tl["bmin"].min(axis=0)
    hi = tl["scene_hi"] if "scene_hi" in tl else tl["bmax"].max(axis=0)
    diag = jnp.sqrt(jnp.sum((hi - lo) ** 2))

    t_hi0 = jnp.where(t_max <= 0, 0.0, t_max)
    rays8_0 = _pack_rays8(origins, directions, t_hi0)
    b_entry = (block_entries_envelope(rays8_0, bounds8)
               if coherent else block_entries(rays8_0, bounds8))
    keys_all, counts_all = sort_candidates(b_entry, diag, M_C)

    def one_pass(state):
        it, best_t, best_slot, finished = state
        t_hi = jnp.minimum(t_max, best_t)
        if any_hit:
            t_hi = jnp.where(best_slot >= 0, 0.0, t_hi)
        t_hi = jnp.where(finished, 0.0, t_hi)
        rays8 = _pack_rays8(origins, directions, t_hi)
        ids, counts, tnears, next_tnear = window_candidates(
            keys_all, counts_all, it, diag, M_C, t_p)
        cids, ccounts, ctnears = expand_children(
            ids, origins, directions, t_hi, tl["bmin32"], tl["bmax32"],
            diag, t_p)
        t_row, s_row = _run_tvisit_kernel(
            rays8, cids, ccounts, ctnears, tl["wplanes32"], k32,
            float(config.t_epsilon), any_hit)
        better = (s_row >= 0) & (t_row < jnp.minimum(best_t, t_max))
        new_t = jnp.where(better, t_row, best_t)
        new_slot = jnp.where(better, s_row, best_slot)
        overflow = counts_all > (it + 1) * M_C
        blk_of = jnp.repeat(overflow, BLOCK)[:n]
        ray_next = jnp.repeat(next_tnear, BLOCK)[:n]
        if any_hit:
            fin = finished | ~blk_of | (new_slot >= 0)
        else:
            fin = finished | ~blk_of | (new_t <= ray_next)
        return it + 1, new_t, new_slot, fin

    n_windows = keys_all.shape[1] // M_C

    def cond(state):
        it, _, _, finished = state
        return (it < n_windows) & ~jnp.all(finished)

    state = (jnp.int32(0), jnp.broadcast_to(t_max, (n,)),
             jnp.full(n, -1, jnp.int32), t_max <= 0)
    _, t, slot, _ = jax.lax.while_loop(cond, one_pass, state)
    return t, slot


def closest_hit(scene, origins, directions, config: RenderConfig,
                t_max=None, sort: bool = True, coherent: bool = False):
    """Intersector ABI: (t, prim, u, v); lanes with t_max == 0 are dead.
    Slot space is the SAME padded slot space as the production visit
    kernel (child*K32 + lane == cell*128 + sub-range), so the shared
    driver's slot_to_prim / verts refinement applies unchanged."""
    from .visit_intersect import closest_hit_driver
    return closest_hit_driver(_trace, scene, origins, directions,
                              config, t_max, sort, coherent)


def any_hit(scene, origins, directions, dist, config: RenderConfig,
            sort: bool = True, coherent: bool = False):
    """Occlusion: True where something lies closer than ``dist``."""
    from .visit_intersect import any_hit_driver
    return any_hit_driver(_trace, scene, origins, directions, config,
                          dist, sort, coherent)
