"""Corrected sort-key sim: sortkey_sim.py normalized origins by
bmax.max(0) which includes 3e37 PADDING cells — its origin mortons were
degenerate zeros, so its "oct|m5(o)|m2(d)" row actually measured
octant|m2(d) with dump-order ties. This version uses the real cell box
and spells every scheme out explicitly. Stable sort throughout (ties
keep dump order = production compaction order)."""
import sys
import numpy as np

npz = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d1_stream.npz")
o = npz["origin"]; d = npz["direction"]
tmax = npz["tmax"]; t_hit = npz["t_hit"]
bmin = npz["bmin"]; bmax = npz["bmax"]
real = bmax[:, 0] < 1e30
lo = bmin[real].min(axis=0); hi = bmax[real].max(axis=0)
T = bmin.shape[0]; N = o.shape[0]
B = 256
NS = 192
rng = np.random.default_rng(0)
ext = np.maximum(hi - lo, 1e-6)
oq = np.clip((o - lo) / ext, 0, 1)
dq = np.clip((d + 1) * 0.5, 0, 1)


def quant(x, bits):
    return np.minimum((x * (1 << bits)).astype(np.uint64), (1 << bits) - 1)


def morton(q, bits):
    out = np.zeros(N, np.uint64)
    for i in range(bits):
        for ax in range(3):
            out |= ((quant(q[:, ax], bits) >> i) & 1) << (3 * i + (2 - ax))
    return out


def octant(dv):
    return ((dv[:, 0] > 0).astype(np.uint64)
            | ((dv[:, 1] > 0).astype(np.uint64) << 1)
            | ((dv[:, 2] > 0).astype(np.uint64) << 2))


oct_ = octant(d)
schemes = {
    "as-dumped (production)": None,
    "PROD oct|m5(o)|m2(d)": (oct_ << 21) | (morton(oq, 5) << 6) | morton(dq, 2),
    "oct|m2(d)|m5(o)": (oct_ << 21) | (morton(dq, 2) << 15) | morton(oq, 5),
    "oct|m2(d)|m7(o)": (oct_ << 27) | (morton(dq, 2) << 21) | morton(oq, 7),
    "oct|m3(d)|m5(o)": (oct_ << 24) | (morton(dq, 3) << 15) | morton(oq, 5),
    "oct|m3(d)|m4(o)": (oct_ << 21) | (morton(dq, 3) << 12) | morton(oq, 4),
    "oct|m4(d)|m4(o)": (oct_ << 24) | (morton(dq, 4) << 12) | morton(oq, 4),
    "oct|m2(d)|m3(o)": (oct_ << 15) | (morton(dq, 2) << 9) | morton(oq, 3),
    "oct|m1(d)|m5(o)": (oct_ << 18) | (morton(dq, 1) << 15) | morton(oq, 5),
    "oct|m2(d) only": (oct_ << 6) | morton(dq, 2),
}

# precompute crossings on a block sample per scheme
def eval_order(order):
    nb_all = N // B
    pick = rng.choice(nb_all, size=min(NS, nb_all), replace=False)
    tot_u = tot_e = 0
    for b in pick:
        rows = order[b * B:(b + 1) * B]
        o_c, d_c = o[rows], d[rows]
        safe = np.where(np.abs(d_c) < 1e-12,
                        np.where(d_c < 0, -1e-12, 1e-12), d_c)
        inv = (1.0 / safe)[:, None]
        t1 = (bmin[None] - o_c[:, None]) * inv
        t2 = (bmax[None] - o_c[:, None]) * inv
        ent = np.max(np.minimum(t1, t2), axis=-1)
        ext_ = np.min(np.maximum(t1, t2), axis=-1)
        tm = tmax[rows]
        th = np.minimum(t_hit[rows], tm)
        crossed = (ent < np.minimum(ext_, tm[:, None])) & (tm > 0)[:, None]
        resolves = crossed & (ent <= th[:, None]) & (th[:, None] <= ext_)
        union = np.flatnonzero(crossed.any(axis=0))
        u = union.size
        tot_u += u
        if u == 0:
            continue
        be = np.where(crossed[:, union], ent[:, union], 1e30)
        order_u = np.argsort(be.min(axis=0), kind="stable")
        rank = np.empty_like(order_u)
        rank[order_u] = np.arange(u)
        res = resolves[:, union]
        pos = np.where(res, rank[None, :], u + 10**6).min(axis=1)
        pos = np.minimum(pos, u - 1)
        tot_e += int(pos.max()) + 1
    n = len(pick)
    return tot_u / n, tot_e / n


for name, key in schemes.items():
    order = (np.arange(N) if key is None
             else np.argsort(key, kind="stable"))
    u, e = eval_order(order)
    print(f"{name:26s} union/blk {u:7.1f}  exec/blk {e:7.1f}", flush=True)
