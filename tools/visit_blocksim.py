"""Offline (numpy) simulator for the visit kernel's block economics.

Reads the real depth-1 bounce stream dumped by tools/visit_mc_ab.py and,
for several ray-block sizes, reports per-block union size (granules any
member ray crosses, to t_max) and EXECUTED visits under the kernel's
exit rule, approximated as: block exec = 1 + max over member rays of the
sorted position of the ray's RESOLVING granule (first crossed granule
whose [entry, exit] contains the final hit t) — the straggler bound.
Run on CPU — no TPU needed.
"""
import sys

import numpy as np

npz = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d1_stream.npz")
o = npz["origin"]
d = npz["direction"]
tmax = npz["tmax"]
t_hit = npz["t_hit"]
bmin = npz["bmin"]
bmax = npz["bmax"]
T = bmin.shape[0]
N = o.shape[0]
S = min(32768, N)
print(f"stream N={N} granules T={T} live {(tmax > 0).mean():.2f} "
      f"(sim on first {S})")

CH = 2048
stats = {B: [0, 0, 0] for B in (64, 128, 256)}   # nblk, union, exec
for s in range(0, S, CH):
    e = min(s + CH, S)
    o_c, d_c = o[s:e], d[s:e]
    safe = np.where(np.abs(d_c) < 1e-12,
                    np.where(d_c < 0, -1e-12, 1e-12), d_c)
    inv = (1.0 / safe)[:, None]
    t1 = (bmin[None] - o_c[:, None]) * inv
    t2 = (bmax[None] - o_c[:, None]) * inv
    ent = np.max(np.minimum(t1, t2), axis=-1)
    ext = np.min(np.maximum(t1, t2), axis=-1)
    live = (tmax[s:e] > 0)[:, None]
    th = np.minimum(t_hit[s:e], tmax[s:e])
    crossed = (ent < np.minimum(ext, tmax[s:e, None])) & live
    resolves = crossed & (ent <= th[:, None]) & (th[:, None] <= ext)
    for B in stats:
        nb = (e - s) // B
        for b in range(nb):
            rows = slice(b * B, (b + 1) * B)
            cr = crossed[rows]
            union = np.flatnonzero(cr.any(axis=0))
            u = union.size
            st = stats[B]
            st[0] += 1
            st[1] += u
            if u == 0:
                continue
            be = np.where(cr[:, union], ent[rows][:, union], 1e30)
            order = np.argsort(be.min(axis=0), kind="stable")
            rank = np.empty_like(order)
            rank[order] = np.arange(u)
            res = resolves[rows][:, union]
            # per ray: sorted position of its first resolving granule
            # (rays that resolve nothing walk the whole union)
            pos = np.where(res, rank[None, :], u + 10**6).min(axis=1)
            pos = np.minimum(pos, u - 1)
            st[2] += int(pos.max()) + 1

for B, (nblk, un, ex) in stats.items():
    print(f"B={B:4d}: union/blk {un / nblk:7.1f}  exec/blk {ex / nblk:7.1f}"
          f"  exec-tests/ray {ex / nblk * 128 / B * B / B:8.0f}"
          f"  work/ray(256-rel) {ex / nblk * B / 256:7.1f}")
