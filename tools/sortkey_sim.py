"""A/B ray-ordering keys by visit-kernel block economics (offline).

Loads the real depth-1 bounce stream (/tmp/d1_stream.npz from
tools/visit_mc_ab.py), re-sorts it under several candidate coherence
keys, and reports per-256-ray-block union size + straggler-bound
executed visits (the tools/visit_blocksim.py model) — the quantity the
visit kernel's runtime is linear in.

The production key is (dead, octant3 | morton7(origin)) — origins are
bounce hit points, directions hemisphere-scattered, so a block shares a
neighborhood but its rays fan out; candidates are the union of all
crossed cells. Finer DIRECTION bits trade origin locality for cone
coherence. CPU-only statistics.
"""
import sys

import numpy as np

npz = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d1_stream.npz")
o = npz["origin"]; d = npz["direction"]
tmax = npz["tmax"]; t_hit = npz["t_hit"]
bmin = npz["bmin"]; bmax = npz["bmax"]
T = bmin.shape[0]; N = o.shape[0]
B = 256
N_SAMPLE_BLOCKS = 192
rng = np.random.default_rng(0)

lo = bmin.min(axis=0); hi = bmax.max(axis=0)
ext = np.maximum(hi - lo, 1e-6)
oq = np.clip((o - lo) / ext, 0, 1)          # normalized origins


def interleave(parts):
    """parts: list of (array, bits) msb-first round-robin interleave."""
    total = sum(b for _, b in parts)
    out = np.zeros(N, np.uint64)
    idx = [b - 1 for _, b in parts]          # next bit (msb first)
    pos = total - 1
    while pos >= 0:
        for j, (arr, bits) in enumerate(parts):
            if idx[j] >= 0:
                out |= (((arr.astype(np.uint64) >> idx[j]) & 1) << pos)
                idx[j] -= 1
                pos -= 1
                if pos < 0:
                    break
    return out


def quant(x, bits):
    return np.minimum((x * (1 << bits)).astype(np.uint64),
                      (1 << bits) - 1)


def morton(q, bits):
    return interleave([(quant(q[:, 0], bits), bits),
                       (quant(q[:, 1], bits), bits),
                       (quant(q[:, 2], bits), bits)])


def octant(dv):
    return ((dv[:, 0] > 0).astype(np.uint64)
            | ((dv[:, 1] > 0).astype(np.uint64) << 1)
            | ((dv[:, 2] > 0).astype(np.uint64) << 2))


dq = np.clip((d + 1) * 0.5, 0, 1)            # direction in [0,1]^3

schemes = {
    "as-dumped (production)": None,
    "oct|morton7(o)  [fresh]": (octant(d) << 21) | morton(oq, 7),
    "oct|m5(o)|m2(d)": (octant(d) << 21) | (morton(oq, 5) << 6)
        | morton(dq, 2),
    "oct|m7(o)|m3(d)": (octant(d) << 30) | (morton(oq, 7) << 9)
        | morton(dq, 3),
    "oct|m4(d)|m7(o)": (octant(d) << 33) | (morton(dq, 4) << 21)
        | morton(oq, 7),
    "6D interleave o7 d4": interleave(
        [(quant(oq[:, 0], 7), 7), (quant(oq[:, 1], 7), 7),
         (quant(oq[:, 2], 7), 7), (quant(dq[:, 0], 4), 4),
         (quant(dq[:, 1], 4), 4), (quant(dq[:, 2], 4), 4)]),
    "oct|m2(d)|m7(o)": (octant(d) << 27) | (morton(dq, 2) << 21)
        | morton(oq, 7),
    "morton9(o) only": morton(oq, 9),
}


def econ(order):
    idx = np.arange(N) if order is None else order
    nb = N // B
    blocks = rng.choice(nb, size=min(N_SAMPLE_BLOCKS, nb), replace=False)
    un = ex = 0
    for b in blocks:
        rows = idx[b * B:(b + 1) * B]
        o_c, d_c = o[rows], d[rows]
        safe = np.where(np.abs(d_c) < 1e-12,
                        np.where(d_c < 0, -1e-12, 1e-12), d_c)
        inv = (1.0 / safe)[:, None]
        t1 = (bmin[None] - o_c[:, None]) * inv
        t2 = (bmax[None] - o_c[:, None]) * inv
        ent = np.max(np.minimum(t1, t2), axis=-1)
        xt = np.min(np.maximum(t1, t2), axis=-1)
        tm = tmax[rows]
        th = np.minimum(t_hit[rows], tm)
        crossed = (ent < np.minimum(xt, tm[:, None])) & (tm > 0)[:, None]
        resolves = crossed & (ent <= th[:, None]) & (th[:, None] <= xt)
        union = np.flatnonzero(crossed.any(axis=0))
        u = union.size
        un += u
        if u == 0:
            continue
        be = np.where(crossed[:, union], ent[:, union], 1e30)
        order_g = np.argsort(be.min(axis=0), kind="stable")
        rank = np.empty_like(order_g)
        rank[order_g] = np.arange(u)
        res = resolves[:, union]
        pos = np.where(res, rank[None, :], u + 10 ** 6).min(axis=1)
        pos = np.minimum(pos, u - 1)
        ex += int(pos.max()) + 1
    k = len(blocks)
    return un / k, ex / k


print(f"stream N={N} cells T={T} sample {N_SAMPLE_BLOCKS} blocks of {B}")
for name, key in schemes.items():
    order = None if key is None else np.argsort(key, kind="stable")
    u, e = econ(order)
    print(f"{name:28s} union/blk {u:7.1f}  exec/blk {e:7.1f}")
