"""Parent-cell sort-key sim: does grouping bounce rays by the treelet
CELL of the triangle they bounced off (the traversal's own spatial
structure) beat the 5-bit origin Morton grid?

Needs a stream captured with parent_prim + prim_to_cell
(tools/capture_d1_tpu.py). Cost model = sortkey_sim2.py's: per-256-ray
block, union of crossed cells and executed visits under the straggler
bound (entry-sorted, per-ray resolve at first list position whose cell
interval contains its hit t).
"""
import sys
import numpy as np

npz = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d1_stream.npz")
o = npz["origin"]; d = npz["direction"]
tmax = npz["tmax"]; t_hit = npz["t_hit"]
bmin = npz["bmin"]; bmax = npz["bmax"]
pprim = npz["parent_prim"]; p2c = npz["prim_to_cell"]
real = bmax[:, 0] < 1e30
lo = bmin[real].min(axis=0); hi = bmax[real].max(axis=0)
T = bmin.shape[0]; N = o.shape[0]
B = 256
NS = 192
rng = np.random.default_rng(0)
ext = np.maximum(hi - lo, 1e-6)
oq = np.clip((o - lo) / ext, 0, 1)
dq = np.clip((d + 1) * 0.5, 0, 1)

pcell = np.where(pprim >= 0, p2c[np.clip(pprim, 0, len(p2c) - 1)], T)
pcell = pcell.astype(np.uint64)
print(f"live {(tmax > 0).mean():.2f}  parent-cell known "
      f"{(pcell[tmax > 0] < T).mean():.2f}  cells {T}")


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
cb = int(np.ceil(np.log2(max(T + 1, 2))))

# Hilbert-ish cell ordering: cells sorted by morton of their center gives
# cell ids spatial locality when used as a grouping prefix; raw build
# order may already be spatial (centroid cells) — test both.
cc = (bmin + bmax) * 0.5
ccq = np.clip((cc - lo) / ext, 0, 1)
cmort = np.zeros(T, np.uint64)
for i in range(7):
    for ax in range(3):
        q = np.minimum((ccq[:, ax] * (1 << 7)).astype(np.uint64), 127)
        cmort |= ((q >> np.uint64(i)) & 1) << np.uint64(3 * i + (2 - ax))
cell_rank = np.empty(T + 1, np.uint64)
cell_rank[np.argsort(cmort, kind="stable")] = np.arange(T, dtype=np.uint64)
cell_rank[T] = T
pcell_m = cell_rank[np.minimum(pcell, T)]

schemes = {
    "as-dumped (production)": None,
    "PROD oct|m2(d)|m5(o)": (oct_ << 21) | (morton(dq, 2) << 15)
                            | morton(oq, 5),
    "oct|m2(d)|cell": (oct_ << np.uint64(6 + cb))
                      | (morton(dq, 2) << np.uint64(cb)) | pcell,
    "oct|m2(d)|cellmort": (oct_ << np.uint64(6 + cb))
                          | (morton(dq, 2) << np.uint64(cb)) | pcell_m,
    "oct|cell|m2(d)": (oct_ << np.uint64(6 + cb))
                      | (pcell << np.uint64(6)) | morton(dq, 2),
    "oct|cellmort|m2(d)": (oct_ << np.uint64(6 + cb))
                          | (pcell_m << np.uint64(6)) | morton(dq, 2),
    "cellmort|oct|m2(d)": (pcell_m << np.uint64(9))
                          | (oct_ << np.uint64(6)) | morton(dq, 2),
    "oct|m2(d)|cellm|m5(o)": (oct_ << np.uint64(21 + cb))
                             | (morton(dq, 2) << np.uint64(15 + cb))
                             | (pcell_m << np.uint64(15)) | morton(oq, 5),
    "oct|m3(d)|cellmort": (oct_ << np.uint64(9 + cb))
                          | (morton(dq, 3) << np.uint64(cb)) | pcell_m,
}


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
