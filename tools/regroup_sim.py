"""Offline sim: two-phase visit tracing with inter-pass ray regrouping.

The visit kernel's per-block cost is the straggler bound: the block walks
its entry-sorted union until EVERY ray's best hit precedes the next
granule's entry (miss rays never resolve, so one sky ray forces the full
union walk). Phase A walks only the first W visits per block; rays still
unresolved (pos >= W) compact into fresh 256-ray blocks (same key order)
and phase B walks those to completion. Reports total executed visits —
the quantity the kernel runtime is linear in — vs the single-phase
baseline, on the real depth-1 bounce stream (/tmp/d1_stream.npz).

CPU-only statistics; run before building the driver restructure.
"""
import sys

import numpy as np

npz = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d1_stream.npz")
o = npz["origin"]; d = npz["direction"]
tmax = npz["tmax"]; t_hit = npz["t_hit"]
bmin = npz["bmin"]; bmax = npz["bmax"]
T = bmin.shape[0]
N = o.shape[0]
import os
B = int(os.environ.get("RS_B", 256))
S = min(65536, N)
print(f"stream N={N} T={T} live={(tmax > 0).mean():.2f} sim on {S}")

# ---- production key: octant | morton2(dir) | morton5(origin), dead last
# (direction-major since sortkey_sim2; box excludes 3e37 padding cells)
_real = bmax[:, 0] < 1e30
lo = bmin[_real].min(axis=0); hi = bmax[_real].max(axis=0)
ext = np.maximum(hi - lo, 1e-6)


def morton3(q, bits):
    out = np.zeros(q.shape[0], np.uint64)
    for b in range(bits):
        for ax in range(3):
            out |= ((q[:, ax].astype(np.uint64) >> b) & 1) << (3 * b + ax)
    return out


def prod_key(o_, d_, dead):
    oq = np.clip((o_ - lo) / ext, 0, 1)
    qi = np.minimum((oq * 31).astype(np.uint64), 31)
    octant = ((d_[:, 0] > 0).astype(np.uint64)
              | ((d_[:, 1] > 0).astype(np.uint64) << 1)
              | ((d_[:, 2] > 0).astype(np.uint64) << 2))
    dq = np.clip((d_ + 1) * 0.5, 0, 1)
    di = np.minimum((dq * 4).astype(np.uint64), 3)
    key = (octant << 21) | (morton3(di, 2) << 15) | morton3(qi, 5)
    return key | (dead.astype(np.uint64) << 40)


key = prod_key(o, d, tmax <= 0)
order = np.argsort(key, kind="stable")[:S]
o_s, d_s = o[order], d[order]
tmax_s, th_s = tmax[order], np.minimum(t_hit[order], tmax[order])

# ---- per-ray crossed/resolving tables (chunked)
CH = 2048
crossed = np.zeros((S, T), bool)
resolves = np.zeros((S, T), bool)
ent_all = np.zeros((S, T), np.float32)
for s in range(0, S, CH):
    e = min(s + CH, S)
    dc = d_s[s:e]
    safe = np.where(np.abs(dc) < 1e-12, np.where(dc < 0, -1e-12, 1e-12), dc)
    inv = (1.0 / safe)[:, None]
    t1 = (bmin[None] - o_s[s:e, None]) * inv
    t2 = (bmax[None] - o_s[s:e, None]) * inv
    en = np.max(np.minimum(t1, t2), axis=-1)
    ex = np.min(np.maximum(t1, t2), axis=-1)
    live = (tmax_s[s:e] > 0)[:, None]
    crossed[s:e] = (en < np.minimum(ex, tmax_s[s:e, None])) & live
    resolves[s:e] = (crossed[s:e] & (en <= th_s[s:e, None])
                     & (th_s[s:e, None] <= ex))
    ent_all[s:e] = en


def block_exec(rows, wcap=None):
    """Executed visits for one block of ray rows (straggler bound),
    plus per-ray resolved-within flags. wcap limits the window."""
    cr = crossed[rows]
    union = np.flatnonzero(cr.any(axis=0))
    u = union.size
    if u == 0:
        return 0, np.ones(len(rows), bool)
    be = np.where(cr[:, union], ent_all[rows][:, union], 1e30)
    rank_order = np.argsort(be.min(axis=0), kind="stable")
    rank = np.empty(u, np.int64)
    rank[rank_order] = np.arange(u)
    res = resolves[rows][:, union]
    pos = np.where(res, rank[None, :], 10**9).min(axis=1)
    # LIVE miss rays (resolve nothing) walk the whole union; DEAD rays
    # (t_max <= 0, the kernel's `fin | (t_max <= 0)`) resolve at once
    pos = np.where(pos >= 10**9, u - 1, pos)
    pos = np.where(tmax_s[rows] <= 0, -1, pos)
    straggler = int(pos.max()) + 1
    if wcap is None:
        return straggler, np.ones(len(rows), bool)
    w = min(straggler, wcap)
    return w, pos < wcap


def run(order_idx, wcap):
    """order_idx: ray order (array of row ids). Returns (visits, done)."""
    total = 0
    done = np.zeros(S, bool)
    nb = len(order_idx) // B
    for b in range(nb):
        rows = order_idx[b * B:(b + 1) * B]
        ex, fin = block_exec(rows, wcap)
        total += ex
        done[rows[fin]] = True
    tail = order_idx[nb * B:]
    if len(tail):
        ex, fin = block_exec(tail, wcap)
        total += ex
        done[tail[fin]] = True
    return total, done


base = np.arange(S)
v0, _ = run(base, None)
nb0 = S // B
print(f"baseline 1-phase: exec/blk {v0 / nb0:7.1f}  total visits {v0}")

for W in (16, 32, 48, 64):
    vA, doneA = run(base, W)
    surv = base[~doneA]
    # phase B: survivors compact in key order (already sorted)
    vB, doneB = run(surv, None)
    # phase B fixed-cost proxy: enum+sort scale with survivor count
    frac = len(surv) / S
    print(f"W={W:3d}: A {vA / nb0:6.1f}/blk  surv {frac * 100:5.1f}%  "
          f"B {vB / max(1, len(surv) // B):6.1f}/blk  "
          f"total {(vA + vB) / nb0:6.1f}/blk-eq  "
          f"({(vA + vB) / v0 * 100:5.1f}% of baseline)")

# oracle: rays sorted by their single-phase pos (upper bound on any
# regrouping scheme's benefit)
pos_g = np.where(resolves, np.argsort(np.argsort(ent_all, axis=1),
                                      axis=1), 10**9).min(axis=1)
print("(oracle uses global entry rank as pos proxy)")
oracle = np.argsort(np.where(pos_g >= 10**9, 10**6, pos_g), kind="stable")
v_o, _ = run(oracle, None)
print(f"oracle pos-sort: exec/blk {v_o / nb0:7.1f} "
      f"({v_o / v0 * 100:5.1f}% of baseline)")


# ---- refinements: multi-phase + phase-B ordering alternatives
def dir_key(rows):
    dq = np.clip((d_s[rows] + 1) * 0.5, 0, 1)
    di = np.minimum((dq * 16).astype(np.uint64), 15)
    return morton3(di, 4)


print("\nmulti-phase / B-order refinements:")
for Ws in ((32, 64), (32, 96), (16, 48), (32,), (48,)):
    done = np.zeros(S, bool)
    cur = base
    tot = 0
    for W in Ws:
        v, dn = run(cur, W)
        tot += v
        done[cur[~np.isin(cur, cur)]] = False  # no-op, keep shape
        cur = cur[~dn[cur]] if False else cur[np.flatnonzero(~dn[cur])]
        # run() marks done on global array; recompute survivors:
        cur = cur[~dn[cur]]
    # final phase to completion
    v, _ = run(cur, None)
    tot += v
    print(f"Ws={Ws}: total {tot / nb0:6.1f}/blk-eq ({tot / v0 * 100:5.1f}%)")

# phase B ordered by direction-major key
vA, doneA = run(base, 32)
surv = base[~doneA]
sk = dir_key(surv)
surv_d = surv[np.argsort(sk, kind="stable")]
vB, _ = run(surv_d, None)
print(f"W=32 + B dir-major: total {(vA + vB) / nb0:6.1f}/blk-eq "
      f"({(vA + vB) / v0 * 100:5.1f}%)")
# phase B with windows too (W=64) then final
vB1, doneB = run(surv, 64)
surv2 = surv[~doneB[surv]]
vB2, _ = run(surv2, None)
print(f"W=32 + B(W=64) + C: total {(vA + vB1 + vB2) / nb0:6.1f}/blk-eq "
      f"({(vA + vB1 + vB2) / v0 * 100:5.1f}%)  "
      f"surv2 {len(surv2) / S * 100:.1f}%")
