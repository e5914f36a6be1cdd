"""Two-level union restriction sim (STATUS lever #1 'untried'): split a
256-ray block into S row sub-blocks, each with its OWN entry-sorted visit
list, processed side-by-side in one kernel step (dense work per step is
unchanged: S disjoint (256/S, K) ops == one (256, K) op on the VPU; DMA
per step grows to S cells). Kernel steps per block = max over sub-blocks
of their executed-visit counts, vs the current single union list.

Reports, per sub-block count S in {1, 2, 4, 8}:
  steps/blk   = mean over blocks of max_s exec_s  (dense cost model)
  sum/blk     = mean of sum_s exec_s / S          (DMA + balance headroom)
  ratio vs S=1 steps (the dense-work saving if fixed costs were free)

Uses the same captured stream + executed-visit model as sortkey_sim2.py
(crossed cells entry-sorted, early exit at the rank where every ray's
winner has resolved). Run on /tmp/d1_stream.npz (tools/capture_d1_tpu.py).
"""
import sys

import numpy as np

npz = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d1_stream.npz")
o = npz["origin"]; d = npz["direction"]
tmax = npz["tmax"]; t_hit = npz["t_hit"]
bmin = npz["bmin"]; bmax = npz["bmax"]
real = bmax[:, 0] < 1e30
lo = bmin[real].min(axis=0); hi = bmax[real].max(axis=0)
N = o.shape[0]
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


oct_ = ((d[:, 0] > 0).astype(np.uint64)
        | ((d[:, 1] > 0).astype(np.uint64) << 1)
        | ((d[:, 2] > 0).astype(np.uint64) << 2))
# production compaction key: octant | morton2(dir) | morton5(origin)
key = (oct_ << 21) | (morton(dq, 2) << 15) | morton(oq, 5)
order = np.argsort(key, kind="stable")


def exec_count(rows):
    """Executed visits for one ray group under the entry-sorted early-exit
    model (same as sortkey_sim2.eval_order, factored per group)."""
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
    if u == 0:
        return 0
    be = np.where(crossed[:, union], ent[:, union], 1e30)
    order_u = np.argsort(be.min(axis=0), kind="stable")
    rank = np.empty_like(order_u)
    rank[order_u] = np.arange(u)
    res = resolves[:, union]
    pos = np.where(res, rank[None, :], u + 10**6).min(axis=1)
    pos = np.minimum(pos, u - 1)
    return int(pos.max()) + 1


nb_all = N // B
pick = rng.choice(nb_all, size=min(NS, nb_all), replace=False)
base = None
for S in (1, 2, 4, 8):
    g = B // S
    steps = 0.0
    tot = 0.0
    for b in pick:
        rows = order[b * B:(b + 1) * B]
        ex = [exec_count(rows[s * g:(s + 1) * g]) for s in range(S)]
        steps += max(ex)
        tot += sum(ex) / S
    steps /= len(pick)
    tot /= len(pick)
    if base is None:
        base = steps
    print(f"S={S}  steps/blk {steps:7.1f}  mean-exec/blk {tot:7.1f}  "
          f"dense-ratio {steps / base:5.3f}", flush=True)
