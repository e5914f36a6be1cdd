"""Per-block exact visit-list Pallas intersector — THE flagship.

Replaced both prior TPU traversal strategies on the hot path in round 2
(both DELETED in round 5, numbers in STATUS.md):

* the super-cell envelope kernel culled per ray-block ENVELOPE (interval
  arithmetic over the block's origins x directions). Coherent blocks are
  fine; scattered bounce blocks pay ~102 candidate supers because the
  envelope is the union of 256 rays' slabs made conservative.
* the pair-expansion driver got exact per-ray candidates but paid
  ~270 ms of XLA sorts per 518k-ray launch (enumerate row-sort,
  pair-expansion sort, combine sort) against only ~120 ms of kernel
  time.

This module keeps the exactness and drops the sorts: the candidate unit is
the per-256-ray-BLOCK **exact union** of crossed cells (or supers).

1. **Enumerate (Pallas)**: a small kernel computes, per ray block, the
   entry lower bound of every cell the block crosses — (256, T) slab
   tiles live entirely in VMEM (an equivalent XLA map materializes the
   (N, T, 3) product in HBM: 25 GB at 518k x 4096 — measured OOM).
2. **Order (XLA)**: per block, candidates sort by packed
   (quantized-entry, cell id) keys — a (NB, T) row sort, ~40x smaller
   than the pair driver's 12.4M-element sorts.
3. **Kernel (Pallas)**: per block, walk the visit list front-to-back; per
   visit DMA one granule's Woop planes (G*16, K) HBM→VMEM (pipelined) and
   dense-intersect all 256 rays, committing per-ray best (t, slot).
   Early-exit once every ray's best hit precedes the next granule's entry
   lower bound. Results come out in ray order — no combine pass.
4. **Recull pass (driver)**: blocks whose union overflowed the visit cap
   continue from an exact per-block watermark under the pass-tightened
   horizon. Guarantees exactness without full scans.

The TPU answer to per-ray BVH traversal (reference mbvh_node.h:122-307,
CUDAIntersect.h): traversal *order* lives in the block-level candidate
tables; the lockstep VPU only ever runs dense (256, K) Woop tests
(exact-f32 broadcast FMA — MXU matmuls at default precision flip
closest-hit winners; at precision=HIGHEST they lose to VPU FMAs,
measured 576 vs 394 ms in round 2).

Measured-dead variants were REMOVED in round 4 (STATUS.md keeps the
numbers): the two-phase mid-trace regroup v1/v2 (_trace_regroup +
next_entries — 1124/588 ms vs 352/367 ms for the plain walk; the v1
on-chip 'win' was the NaN-bitcast merge bug) and the two-level union
restriction s_sub (on-chip 0.956-1.41x, tools history). Block
formation is also at its floor: every parent-cell grouping key loses
to the production octant|morton(dir)|morton(origin) compaction key
(round-4 sortkey_cell_sim result in STATUS.md). Round 5 pinned the
remaining constants — the inner loop runs within 6% of the VPU's pure
FMA issue rate, division included (tools/r5_kernel_micro.py), and the
sub-granularity/transposed/pair alternatives all measured slower
(STATUS.md round-5 analysis) — so this architecture is the fixed point
on this hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .intersect import BIG_T, intersect_tri

BLOCK = 256        # rays per block
M_C = 128          # visit-list cap (granules per block per pass)
PIPE = 8           # in-flight DMAs: per-visit compute is below the ~4 us
#                    HBM latency; a deep pipeline keeps the DMA engine busy
# recull passes run to the exact per-launch bound ceil(T_padded / M_C)
# (all windows of the one-shot candidate table): a CONSTANT cap (16 in
# round 2) silently treated rays in blocks whose visit list outruns
# cap*M_C granules as misses — T already exceeds 16*128 = 2048 cells at
# pica-4x scale (305k tris / 128 = ~2400), and conservative envelope
# lists hit the cap in practice (tools/d0_stage_ab.py env rows drifted).
# The while_loop still exits as soon as every ray is finished, so the
# exact bound costs nothing on the common 1-2 pass path.
ENUM_TILE = 1024   # granules per VMEM tile in the enumeration kernel
EXIT_EVERY = 4     # visits between front-to-back exit reductions
_BIGKEY = np.float32(1 << 25)   # np: no backend init at import


def _cid_bits(t_c: int) -> int:
    return max((t_c - 1).bit_length(), 1)


# ---------------------------------------------------------------------------
# Phase 1: per-block entry bounds (Pallas — no HBM temps)
# ---------------------------------------------------------------------------

def _enum_kernel(t_dim: int,
                 rays_ref,        # (64, BLOCK) — 8 ray blocks of 8 rows
                 bounds_ref,      # (8, T) lo.xyz, hi.xyz, 0, 0
                 entry_out):      # (8, T) — per-block entry lower bounds
    # Each program computes 8 ray blocks and OWNS its whole output
    # window. (A window shared across 8 programs — each writing one row —
    # is clobbered by Pallas' whole-block write-back of write-only
    # outputs.)
    for blk in range(8):
        rays = rays_ref[8 * blk:8 * blk + 8, :]
        tm_col = rays[3:4, :].T                 # (BLOCK, 1)
        o_col = []
        inv_col = []
        for ax in range(3):
            o_col.append(rays[ax:ax + 1, :].T)  # (BLOCK, 1)
            dax = rays[4 + ax:5 + ax, :].T
            safe = jnp.where(jnp.abs(dax) < 1e-12,
                             jnp.where(dax < 0, -1e-12, 1e-12), dax)
            inv_col.append(1.0 / safe)

        for s in range(0, t_dim, ENUM_TILE):
            w = min(ENUM_TILE, t_dim - s)
            ent = jnp.zeros((BLOCK, w), jnp.float32)
            ext = jnp.full((BLOCK, w), 3e38, jnp.float32)
            for ax in range(3):
                b_lo = bounds_ref[ax:ax + 1, s:s + w]      # (1, w)
                b_hi = bounds_ref[3 + ax:4 + ax, s:s + w]
                t1 = (b_lo - o_col[ax]) * inv_col[ax]      # (BLOCK, w)
                t2 = (b_hi - o_col[ax]) * inv_col[ax]
                ent = jnp.maximum(ent, jnp.minimum(t1, t2))
                ext = jnp.minimum(ext, jnp.maximum(t1, t2))
            crossed = ent < jnp.minimum(ext, tm_col)
            e = jnp.where(crossed, ent, 1e30)
            entry_out[blk:blk + 1, s:s + w] = jnp.min(
                e, axis=0, keepdims=True).reshape(1, w)


@jax.jit
def block_entries(rays8, bounds8):
    """rays8 (NB*8, BLOCK) → (NB, T) per-block entry lower bounds."""
    nb = rays8.shape[0] // 8
    t_dim = bounds8.shape[1]
    pad_nb = (-nb) % 8
    if pad_nb:   # one program computes 8 ray blocks
        rays8 = jnp.pad(rays8, ((0, pad_nb * 8), (0, 0)))
    kernel = functools.partial(_enum_kernel, t_dim)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=((nb + pad_nb) // 8,),
        in_specs=[
            pl.BlockSpec((64, BLOCK), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, t_dim), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, t_dim), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        out_shape=jax.ShapeDtypeStruct((nb + pad_nb, t_dim),
                                       jnp.float32),
    )(rays8, bounds8)
    return out[:nb]


@jax.jit
def block_entries_envelope(rays8, bounds8):
    """Per-BLOCK interval-envelope entry bounds: (NB, T) like
    ``block_entries`` but from NB×T slab tests instead of N×T — ~BLOCK×
    fewer ops (the enum kernel is ~27 ms of a 44 ms coherent closest
    launch). Conservative: envelope-crossed ⊇ any-ray-crossed and the
    entry value is a lower bound for every ray in the block, so
    front-to-back exit and recull watermarks stay exact; only the visit
    lists grow. Use for COHERENT streams (primary tiles, converging
    shadow rays) — scattered blocks degrade to near-full scans (the
    round-1 envelope-cull lesson, module doc)."""
    nb = rays8.shape[0] // 8
    r = rays8.reshape(nb, 8, BLOCK)
    o = r[:, 0:3]                                  # (NB, 3, g)
    tm = r[:, 3]                                   # (NB, g)
    d = r[:, 4:7]
    t_hi = tm.max(axis=1)[:, None]                 # (NB, 1)
    o_lo, o_hi = o.min(axis=2), o.max(axis=2)      # (NB, 3)
    safe = jnp.where(jnp.abs(d) < 1e-12,
                     jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = 1.0 / safe
    inv_lo, inv_hi = inv.min(axis=2), inv.max(axis=2)
    ent = jnp.zeros((nb, bounds8.shape[1]), jnp.float32)
    ext = jnp.full((nb, bounds8.shape[1]), 3e38, jnp.float32)
    for ax in range(3):
        b_lo = bounds8[ax][None, :]                # (1, T)
        b_hi = bounds8[3 + ax][None, :]
        il = inv_lo[:, ax:ax + 1]
        ih = inv_hi[:, ax:ax + 1]
        lo1, hi1 = _imul(b_lo - o_hi[:, ax:ax + 1],
                         b_lo - o_lo[:, ax:ax + 1], il, ih)
        lo2, hi2 = _imul(b_hi - o_hi[:, ax:ax + 1],
                         b_hi - o_lo[:, ax:ax + 1], il, ih)
        ent = jnp.maximum(ent, jnp.minimum(lo1, lo2))
        ext = jnp.minimum(ext, jnp.maximum(hi1, hi2))
    crossed = ent < jnp.minimum(ext, t_hi)
    return jnp.where(crossed, ent, 1e30)


def _imul(a_lo, a_hi, b_lo, b_hi):
    """Interval product endpoints: [a_lo,a_hi]×[b_lo,b_hi]."""
    p1, p2 = a_lo * b_lo, a_lo * b_hi
    p3, p4 = a_hi * b_lo, a_hi * b_hi
    return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))


# ---------------------------------------------------------------------------
# Phase 2: entry-ordered visit lists (XLA — small row sort)
# ---------------------------------------------------------------------------

def sort_candidates(b_entry, diag, m_c: int):
    """(NB, T) entries → (keys_all, counts_all): the FULL entry-sorted
    packed-key table, computed ONCE per launch.

    Granule keys are geometric — an entry value depends only on the ray
    block's origins/directions, never on the per-pass horizons (a
    tightened ``t_hi`` only *removes* granules from the crossed set) —
    so the pass-0 table is a superset ordering that stays valid for
    every recull pass: pass ``it`` consumes the window
    ``[it*m_c, (it+1)*m_c)`` (see ``window_candidates``). Visiting a
    granule the tightened horizon would have pruned is harmless (the
    kernel's front-to-back exit skips it); *skipping* one never happens,
    which is what makes windowed continuation exact. (A per-pass
    re-enumeration with the cheap envelope instead is UNSOUND: envelope
    keys lower-bound per-ray keys, so an unprocessed granule could dip
    below the watermark and be skipped.)

    Keys pack the quantized entry with the granule id into exact-int f32
    (< 2^24) — unique per granule. The table is padded to a multiple of
    ``m_c`` with invalid keys so window slices never clamp into valid
    entries."""
    t_c = b_entry.shape[1]
    cb = _cid_bits(t_c)
    qmax = (1 << (24 - cb)) - 1
    q = jnp.minimum(jnp.floor(b_entry * (qmax / diag)), jnp.float32(qmax))
    q = jnp.maximum(q, 0.0)
    cid = jnp.arange(t_c, dtype=jnp.float32)[None]
    key = q * (1 << cb) + cid
    key = jnp.where(b_entry < BIG_T, key, _BIGKEY)
    keys_all = jax.lax.sort(key, dimension=-1)
    counts_all = jnp.sum(key < _BIGKEY, axis=-1).astype(jnp.int32)
    pad = (-t_c) % m_c
    if pad:
        keys_all = jnp.pad(keys_all, ((0, 0), (0, pad)),
                           constant_values=float(_BIGKEY))
    return keys_all, counts_all


def window_candidates(keys_all, counts_all, it, diag, m_c: int, t_c: int):
    """Pass ``it``'s visit window: (ids, counts, tnears, next_tnear).
    ``next_tnear`` is the entry lower bound of each block's FIRST granule
    beyond this window (BIG_T when exhausted) — a ray whose best hit
    precedes it cannot be beaten by any later pass."""
    cb = _cid_bits(t_c)
    qmax = (1 << (24 - cb)) - 1
    gran = diag / qmax
    t_pad = keys_all.shape[1]
    start = jnp.minimum(it * m_c, t_pad - m_c)
    keys = jax.lax.dynamic_slice_in_dim(keys_all, start, m_c, axis=1)
    counts = jnp.clip(counts_all - it * m_c, 0, m_c)
    ids = jnp.where(keys < _BIGKEY,
                    keys.astype(jnp.int32) & ((1 << cb) - 1), t_c)
    tnears = jnp.where(keys < _BIGKEY,
                       jnp.floor(keys / (1 << cb)) * gran, BIG_T)
    nxt = jax.lax.dynamic_slice_in_dim(
        keys_all, jnp.minimum((it + 1) * m_c, t_pad - 1), 1, axis=1)[:, 0]
    next_tnear = jnp.where(nxt < _BIGKEY,
                           jnp.floor(nxt / (1 << cb)) * gran, BIG_T)
    return ids, counts, tnears, next_tnear


def order_candidates(b_entry, win_key, diag, m_c: int):
    """(NB, T) entries → (ids, counts, overflow, tnears, keys), restricted
    to packed key ≥ ``win_key`` (per-block watermark for recull passes).

    Keys pack the quantized entry with the granule id into exact-int f32
    (< 2^24) — unique per granule, so watermark continuation is exact.
    """
    t_c = b_entry.shape[1]
    cb = _cid_bits(t_c)
    qmax = (1 << (24 - cb)) - 1
    q = jnp.minimum(jnp.floor(b_entry * (qmax / diag)), jnp.float32(qmax))
    q = jnp.maximum(q, 0.0)
    cid = jnp.arange(t_c, dtype=jnp.float32)[None]
    key = q * (1 << cb) + cid
    key = jnp.where((b_entry < BIG_T) & (key >= win_key[:, None]),
                    key, _BIGKEY)
    keys = jax.lax.sort(key, dimension=-1)[:, :m_c]
    counts = jnp.sum(key < _BIGKEY, axis=-1).astype(jnp.int32)
    ids = jnp.where(keys < _BIGKEY,
                    keys.astype(jnp.int32) & ((1 << cb) - 1), t_c)
    gran = diag / qmax
    tnears = jnp.where(keys < _BIGKEY,
                       jnp.floor(keys / (1 << cb)) * gran, BIG_T)
    return ids, jnp.minimum(counts, m_c), counts > m_c, tnears, keys


# ---------------------------------------------------------------------------
# Phase 3: the visit kernel
# ---------------------------------------------------------------------------

def _visit_kernel(super_g: int, k_size: int, m_c: int, t_epsilon: float,
                  any_hit: bool,
                  # SMEM (windowed over 8 grid rows)
                  ids_ref, counts_ref, tnears_ref,
                  # VMEM
                  rays_ref,            # (8, BLOCK) ox,oy,oz,tmax,dx,dy,dz,0
                  wg_hbm,              # (T, G*16, K) Woop planes per granule
                  # outputs (lane-major rows)
                  t_out, slot_out,
                  # scratch
                  btk_s, bgk_s, wp_s, sems):
    """Per-visit commit is a 3-op elementwise running minimum over a
    (BLOCK, K) lane matrix — the ~15-op min+argmin reduction pair the
    first version paid per visit runs ONCE per block at the end, and the
    front-to-back exit reduction is amortized over EXIT_EVERY visits
    (stale per-ray bounds are conservative: exit fires a little later,
    never wrongly)."""
    row = jnp.remainder(pl.program_id(0), 8)
    n_step = counts_ref[row, 0]

    rays = rays_ref[:]
    t_max0 = rays[3:4, :].T                   # (BLOCK, 1)
    ones = jnp.ones((1, BLOCK), jnp.float32)
    o4 = jnp.concatenate([rays[0:3, :], ones], axis=0)
    d3 = rays[4:7, :]

    btk_s[:] = jnp.broadcast_to(t_max0, (BLOCK, k_size))
    bgk_s[:] = jnp.zeros((BLOCK, k_size), jnp.int32)

    def gid(i):
        # clamp twice: into the live prefix of the list (exhausted lists
        # re-test their last granule — idempotent), and to a real granule
        # id (an empty list's slot 0 holds the invalid id t_c)
        j = jnp.clip(jnp.minimum(i, n_step - 1), 0, m_c - 1)
        return jnp.minimum(ids_ref[row, j], wg_hbm.shape[0] - 1)

    def tnear_of(i):
        return tnears_ref[row, jnp.minimum(i, m_c - 1)]

    def dma(slot, g):
        return pltpu.make_async_copy(
            wg_hbm.at[g], wp_s.at[slot], sems.at[slot])

    for k in range(PIPE - 1):
        @pl.when(k < n_step)
        def _(k=k):
            dma(k, gid(k)).start()

    def body(state):
        i, _ = state
        slot = jnp.remainder(i, PIPE)

        @pl.when(i + PIPE - 1 < n_step)
        def _():
            dma(jnp.remainder(i + PIPE - 1, PIPE), gid(i + PIPE - 1)).start()

        dma(slot, gid(i)).wait()

        cur = gid(i)
        wp = wp_s[slot]                       # (G*16, K)

        for j in range(super_g):
            base = 16 * j

            def xf_o(r0):   # [o, 1] · rows → 3 FMA + 1 add
                acc = wp[base + r0 + 3:base + r0 + 4, :] \
                    + o4[0:1, :].T * wp[base + r0:base + r0 + 1, :]
                for q in range(1, 3):
                    acc = acc + (o4[q:q + 1, :].T
                                 * wp[base + r0 + q:
                                      base + r0 + q + 1, :])
                return acc                    # (BLOCK, K)

            def xf_d(r0):   # [d, 0] · rows → the 4th term is exactly 0
                acc = d3[0:1, :].T * wp[base + r0:base + r0 + 1, :]
                for q in range(1, 3):
                    acc = acc + (d3[q:q + 1, :].T
                                 * wp[base + r0 + q:
                                      base + r0 + q + 1, :])
                return acc                    # (BLOCK, K)

            ou, du = xf_o(0), xf_d(0)
            ov, dv = xf_o(4), xf_d(4)
            ow, dw = xf_o(8), xf_d(8)
            valid = jnp.abs(dw) > 1e-12
            t = -ow / jnp.where(valid, dw, 1.0)
            u = ou + t * du
            v = ov + t * dv
            hit = (valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t > t_epsilon))
            t_hit = jnp.where(hit, t, 1e30)
            bt_h = btk_s[:]
            upd = t_hit < bt_h            # strict: earliest visit wins
            btk_s[:] = jnp.where(upd, t_hit, bt_h)
            bgk_s[:] = jnp.where(upd, cur * super_g + j, bgk_s[:])

        import os
        if os.environ.get("RFW_VISIT_NOEXIT"):   # perf/correctness bisect
            done = jnp.bool_(False)
        else:
            def check():
                bt = jnp.min(btk_s[:], axis=1, keepdims=True)
                if any_hit:
                    d_s = ~jnp.any((bt >= t_max0) & (t_max0 > 0))
                else:
                    # front-to-back: once every ray's best precedes
                    # the next granule's entry lower bound, no later
                    # granule can win
                    d_s = jnp.max(bt) <= tnear_of(i + 1)
                return d_s | (i + 1 >= n_step)

            done = jax.lax.cond(
                jnp.remainder(i, EXIT_EVERY) == EXIT_EVERY - 1,
                check, lambda: jnp.bool_(False))
        return i + 1, done

    def cond(state):
        i, done = state
        return (i < n_step) & ~done

    i_end, _ = jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), jnp.bool_(False)))

    for k in range(PIPE - 1):   # drain in-flight DMAs on early exit
        @pl.when(i_end + k < n_step)
        def _(k=k):
            dma(jnp.remainder(i_end + k, PIPE), gid(i_end + k)).wait()

    # one reduction pair per BLOCK: best t, its lane, that lane's cell
    btk = btk_s[:]
    tmin = jnp.min(btk, axis=1, keepdims=True)              # (BLOCK, 1)
    kbest = jnp.argmin(btk, axis=1, keepdims=True).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, k_size), 1)
    gbest = jnp.max(jnp.where(lane == kbest, bgk_s[:], -1),
                    axis=1, keepdims=True)                  # (BLOCK, 1)
    found = tmin < t_max0
    slot_v = jnp.where(found, gbest * k_size + kbest, -1)

    # lane-major output rows: (BLOCK, 1) scratch → (8, BLOCK) broadcast
    # streams contiguously (minor-dim-8 output blocks DMA as 32 B
    # segments — ~5 us/program of pure fixed cost, measured round 1)
    t_out[0, :, :] = jnp.broadcast_to(
        jnp.where(found, tmin, t_max0).reshape(1, BLOCK), (8, BLOCK))
    slot_out[0, :, :] = jnp.broadcast_to(
        slot_v.reshape(1, BLOCK), (8, BLOCK))


@functools.partial(jax.jit, static_argnames=("super_g", "k_size",
                                             "t_epsilon", "any_hit"))
def _run_visit_kernel(rays8, ids, counts, tnears, wgran,
                      super_g: int, k_size: int, t_epsilon: float,
                      any_hit: bool):
    """rays8 (NB*8, BLOCK); ids/tnears (NB, M); counts (NB,).
    Returns per-ray (t, slot) in block-ray order."""
    nb = ids.shape[0]
    m_c = ids.shape[1]
    pad_nb = (-nb) % 8
    if pad_nb:
        ids = jnp.pad(ids, ((0, pad_nb), (0, 0)))
        counts = jnp.pad(counts, (0, pad_nb))
        tnears = jnp.pad(tnears, ((0, pad_nb), (0, 0)))
    in_specs = [
        pl.BlockSpec((8, m_c), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, 1), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, m_c), lambda b: (b // 8, 0),
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
    kernel = functools.partial(_visit_kernel, super_g, k_size, m_c,
                               t_epsilon, any_hit)
    import os
    interpret = (jax.default_backend() == "cpu"
                 or bool(os.environ.get("RFW_VISIT_INTERP")))
    wp_shape = (PIPE, super_g * 16, k_size)
    sem_shape = (PIPE,)
    t, slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, k_size), jnp.float32),
            pltpu.VMEM((BLOCK, k_size), jnp.int32),
            pltpu.VMEM(wp_shape, jnp.float32),
            pltpu.SemaphoreType.DMA(sem_shape),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 8, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, BLOCK), jnp.int32),
        ],
    )(ids, counts.reshape(-1, 1), tnears, rays8, wgran)
    return t[:, 0, :].reshape(-1), slot[:, 0, :].reshape(-1)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _pack_rays8(origins, directions, t_hi):
    n = origins.shape[0]
    nb = n // BLOCK
    o = origins.reshape(nb, BLOCK, 3).transpose(0, 2, 1)
    d = directions.reshape(nb, BLOCK, 3).transpose(0, 2, 1)
    tm = t_hi.reshape(nb, 1, BLOCK)
    zero = jnp.zeros((nb, 1, BLOCK), jnp.float32)
    return jnp.concatenate([o, tm, d, zero], axis=1).reshape(nb * 8, BLOCK)


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
    from .compaction import ray_sort_keys
    lo = tl["scene_lo"] if "scene_lo" in tl else tl["bmin"].min(axis=0)
    hi = tl["scene_hi"] if "scene_hi" in tl else tl["bmax"].max(axis=0)
    keys = ray_sort_keys(origins, directions, lo, hi)
    keys = keys + jnp.where(t_max <= 0, jnp.uint32(1) << 28, 0).astype(
        jnp.uint32)
    order = jnp.argsort(keys).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    return order, inv


def _sort_carry_in(tl, origins, directions, t_max):
    """Coherence-sort rays by carrying them THROUGH one multi-operand
    ``lax.sort`` instead of argsort + row gathers (measured 15.3 vs
    28.1 ms per 1M-lane round trip, tools/compact_ab.py d/e — merge sort
    streams; row gathers are per-row-descriptor-bound). A lane iota as
    the second sort key makes the order exactly the stable argsort order,
    so results are bitwise-identical to the gather path. Returns sorted
    (o, d, t_max, lane); un-permute results with ``_sort_carry_out``."""
    from .compaction import ray_sort_keys
    lo = tl["scene_lo"] if "scene_lo" in tl else tl["bmin"].min(axis=0)
    hi = tl["scene_hi"] if "scene_hi" in tl else tl["bmax"].max(axis=0)
    keys = ray_sort_keys(origins, directions, lo, hi)
    keys = keys + jnp.where(t_max <= 0, jnp.uint32(1) << 28, 0).astype(
        jnp.uint32)
    lane = jnp.arange(origins.shape[0], dtype=jnp.uint32)
    srt = jax.lax.sort(
        (keys, lane,
         origins[:, 0], origins[:, 1], origins[:, 2],
         directions[:, 0], directions[:, 1], directions[:, 2], t_max),
        dimension=0, num_keys=2)
    o = jnp.stack(srt[2:5], axis=1)
    d = jnp.stack(srt[5:8], axis=1)
    return o, d, srt[8], srt[1]


def _sort_carry_out(lane, *cols):
    """Restore original lane order: one sort keyed by the (unique) lane
    ids, carrying the result columns."""
    srt = jax.lax.sort((lane,) + tuple(cols), dimension=0, num_keys=1)
    return srt[1:]


def _granularity(tl, config: RenderConfig):
    """Visit-granule tables: ('cell': one K-tri cell per DMA/visit) or
    ('super': SUPER_G consecutive cells — fewer, fatter visits)."""
    k_size = int(tl["wplanes"].shape[2])
    if config.visit_granularity == "super":
        from ..bvh.wide import SUPER_G
        wp = tl["wplanes"]
        t, rows, k = wp.shape
        wg = wp.reshape(t // SUPER_G, SUPER_G * rows, k)
        bounds = jnp.concatenate([
            tl["sbmin"].T, tl["sbmax"].T,
            jnp.zeros((2, tl["sbmin"].shape[0]), jnp.float32)], axis=0)
        return wg, bounds, SUPER_G, k_size
    bounds = jnp.concatenate([
        tl["bmin"].T, tl["bmax"].T,
        jnp.zeros((2, tl["bmin"].shape[0]), jnp.float32)], axis=0)
    return tl["wplanes"], bounds, 1, k_size


def _trace(scene, origins, directions, t_max, config: RenderConfig,
           any_hit: bool, coherent: bool = False):
    """Visit-list passes to exactness. Returns per-ray (t, slot).
    ``coherent``: enumerate with the per-block envelope (NB x T slab
    tests) instead of per-ray (N x T) — conservative-exact, ~BLOCK x
    cheaper, right for primary tiles / converging shadow rays."""
    tl = scene["treelets"]
    wg, bounds8, super_g, k_size = _granularity(tl, config)
    n = origins.shape[0]
    t_c = bounds8.shape[1]
    t_max = jnp.asarray(t_max, jnp.float32)
    lo = tl["scene_lo"] if "scene_lo" in tl else tl["bmin"].min(axis=0)
    hi = tl["scene_hi"] if "scene_hi" in tl else tl["bmax"].max(axis=0)
    diag = jnp.sqrt(jnp.sum((hi - lo) ** 2))

    # enumerate + sort ONCE per launch (see sort_candidates: keys are
    # geometric, so recull passes just consume successive windows)
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
            keys_all, counts_all, it, diag, M_C, t_c)
        t_row, s_row = _run_visit_kernel(
            rays8, ids, counts, tnears, wg, super_g, k_size,
            float(config.t_epsilon), any_hit)
        # commit ONLY actual new hits: finished blocks run later passes
        # with t_hi = 0 and return (t = 0, slot = -1) — without the
        # s_row >= 0 guard that "0 < best_t" would clobber every
        # previously committed hit (the round-2 TPU 38%-missed-hits bug:
        # coherent streams never multi-pass, so only scattered streams
        # exposed it)
        better = (s_row >= 0) & (t_row < jnp.minimum(best_t, t_max))
        new_t = jnp.where(better, t_row, best_t)
        new_slot = jnp.where(better, s_row, best_slot)
        # a ray is done when its block's window list is exhausted, when
        # its best hit precedes the next window's first entry bound
        # (front-to-back: no later granule can beat it), or — for
        # occlusion — as soon as anything hit.
        overflow = counts_all > (it + 1) * M_C
        blk_of = jnp.repeat(overflow, BLOCK)[:n]
        ray_next = jnp.repeat(next_tnear, BLOCK)[:n]
        if any_hit:
            fin = finished | ~blk_of | (new_slot >= 0)
        else:
            fin = finished | ~blk_of | (new_t <= ray_next)
        return it + 1, new_t, new_slot, fin

    # exact pass bound: every window of the one-shot candidate table
    # (see the module constant note — a fixed cap silently missed hits
    # in blocks whose list outruns cap*M_C granules)
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
    ``sort=False`` for streams already in a coherent order; ``coherent``
    additionally enables the per-block envelope enumeration (valid with
    or without the internal sort — blocks are whatever order the stream
    lands in; callers set it when blocks are TIGHT: primary tiles,
    light-converging shadow rays. Compaction-sorted bounce closest
    measured faster with per-ray enumeration)."""
    return closest_hit_driver(_trace, scene, origins, directions,
                              config, t_max, sort, coherent)


def closest_hit_driver(trace_fn, scene, origins, directions, config,
                       t_max, sort, coherent):
    """Shared closest-hit wrapper around a ``_trace(scene, o, d, tm,
    config, any_hit, coherent) -> (t, slot)`` implementation: coherence
    sort-carry in, ray padding, slot→prim mapping, Möller–Trumbore
    winner refinement, sort-carry out. Serves this module and
    tvisit_intersect (same padded slot space) so the refinement
    contract lives in exactly one place."""
    tl = scene["treelets"]
    n = origins.shape[0]
    if t_max is None:
        t_max = jnp.full(n, BIG_T)
    t_max = jnp.broadcast_to(t_max, (n,))
    lane = None
    if sort:
        origins, directions, t_max, lane = _sort_carry_in(
            tl, origins, directions, t_max)
    o, d, tm, r = _pad_rays(origins, directions, t_max)
    t, slot = trace_fn(scene, o, d, tm, config, any_hit=False,
                       coherent=coherent)
    t, slot = t[:r], slot[:r]
    found = slot >= 0
    prim = jnp.where(found, tl["slot_to_prim"][jnp.maximum(slot, 0)], -1)
    found = found & (prim >= 0)

    # Möller–Trumbore refinement of the winner (exact-f32 precision)
    tv = tl["verts"][jnp.maximum(slot, 0)]
    rhit, rt, ru, rv = intersect_tri(
        o[:r], d[:r], tv[:, 0], tv[:, 1] - tv[:, 0],
        tv[:, 2] - tv[:, 0], t_epsilon=config.t_epsilon * 0.5)
    t = jnp.where(found, jnp.where(rhit, rt, t), BIG_T)
    prim = jnp.where(found, prim, -1)
    u = jnp.where(found & rhit, ru, 0.0)
    v = jnp.where(found & rhit, rv, 0.0)
    if lane is None:
        return t, prim, u, v
    # un-permute by sorting the results back by lane id (sort-carry both
    # ways — cheaper than argsort + row gathers, tools/compact_ab.py d/e)
    t, prim, u, v = _sort_carry_out(lane, t, prim, u, v)
    return t, prim, u, v


def any_hit(scene, origins, directions, dist, config: RenderConfig,
            sort: bool = True, coherent: bool = False):
    """Occlusion: True where something lies closer than ``dist``."""
    return any_hit_driver(_trace, scene, origins, directions, config,
                          dist, sort, coherent)


def any_hit_driver(trace_fn, scene, origins, directions, config, dist,
                   sort, coherent):
    """Shared occlusion wrapper (see closest_hit_driver)."""
    tl = scene["treelets"]
    n = origins.shape[0]
    dist = jnp.broadcast_to(dist, (n,))
    lane = None
    if sort:
        origins, directions, dist, lane = _sort_carry_in(
            tl, origins, directions, dist)
    o, d, tm, r = _pad_rays(origins, directions, dist)
    t, slot = trace_fn(scene, o, d, tm, config, any_hit=True,
                       coherent=coherent)
    slot = slot[:r]
    hit = slot >= 0
    occluded = jnp.where(
        hit, tl["slot_to_prim"][jnp.maximum(slot, 0)], -1) >= 0
    if lane is None:
        return occluded
    # carry as i32 (PRED-typed sort operands are backend-fragile)
    (occ_i,) = _sort_carry_out(lane, occluded.astype(jnp.int32))
    return occ_i > 0
