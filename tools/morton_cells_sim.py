"""Offline A/B: kd-median spatial cells (production) vs Morton-order
cells (128 consecutive tris of a centroid Morton sort — the cell
structure a DEVICE LBVH-style rebuild would produce for free) on the
captured d1 stream's executed-visit model (subblock_sim S=1).

If Morton cells are close to kd cells, per-frame device rebuilds of the
cell structure (config 4 animation) become a pure-jnp sort — no host.

Usage: python tools/morton_cells_sim.py [/tmp/d1_stream.npz]
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

npz = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d1_stream.npz")
o = npz["origin"]; d = npz["direction"]; tmax = npz["tmax"]

# scene geometry (host rebuild, CPU-only)
import os  # noqa: E402
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
import bench as benchmod  # noqa: E402

cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.synchronize()
scene = rs.context._scene
verts = np.asarray(scene["tri_vertices"])      # (T, 3, 3) permuted world
K = cfg.treelet_size

tmin = verts.min(axis=1)
tmaxv = verts.max(axis=1)
cent = 0.5 * (tmin + tmaxv)
lo = tmin.min(0); hi = tmaxv.max(0)
q = np.clip((cent - lo) / np.maximum(hi - lo, 1e-9), 0, 1)


def morton(qq, bits=10):
    out = np.zeros(len(qq), np.uint64)
    qi = np.minimum((qq * (1 << bits)).astype(np.uint64), (1 << bits) - 1)
    for i in range(bits):
        for ax in range(3):
            out |= ((qi[:, ax] >> i) & 1) << (3 * i + (2 - ax))
    return out


def cell_bounds_from_order(order):
    t = len(order)
    n_cells = -(-t // K)
    pad = n_cells * K - t
    oo = np.concatenate([order, np.full(pad, order[-1])])
    bmin = tmin[oo].reshape(n_cells, K, 3).min(axis=1)
    bmax = tmaxv[oo].reshape(n_cells, K, 3).max(axis=1)
    return bmin, bmax


def exec_model(bmin, bmax, label, ns=192, B=256):
    """steps/blk under the entry-sorted early-exit model. Uses the
    captured t_hit as resolve distance (regroup-fixed capture)."""
    th = npz["t_hit"]
    rng = np.random.default_rng(0)
    n = len(o)
    nb = n // B
    pick = rng.choice(nb, size=min(ns, nb), replace=False)
    tot = 0.0
    vol = float(np.prod(np.maximum(bmax - bmin, 0).clip(0, None)
                        .sum(axis=-1))) if False else 0.0
    for b in pick:
        rows = slice(b * B, (b + 1) * B)
        o_c, d_c, tm_c, th_c = o[rows], d[rows], tmax[rows], th[rows]
        safe = np.where(np.abs(d_c) < 1e-12,
                        np.where(d_c < 0, -1e-12, 1e-12), d_c)
        inv = 1.0 / safe
        t1 = (bmin[None] - o_c[:, None]) * inv[:, None]
        t2 = (bmax[None] - o_c[:, None]) * inv[:, None]
        ent = np.max(np.minimum(t1, t2), axis=-1)
        ext = np.min(np.maximum(t1, t2), axis=-1)
        crossed = (ent < np.minimum(ext, tm_c[:, None])) & \
            (tm_c > 0)[:, None]
        resolves = crossed & (ent <= th_c[:, None]) & (th_c[:, None] <= ext)
        union = np.flatnonzero(crossed.any(axis=0))
        if union.size == 0:
            continue
        be = np.where(crossed[:, union], ent[:, union], 1e30)
        order_u = np.argsort(be.min(axis=0), kind="stable")
        rank = np.empty_like(order_u)
        rank[order_u] = np.arange(union.size)
        pos = np.where(resolves[:, union], rank[None, :],
                       union.size + 10**6).min(axis=1)
        pos = np.minimum(pos, union.size - 1)
        tot += pos.max() + 1
    print(f"{label}: steps/blk {tot/len(pick):7.1f}", flush=True)


# production kd cells
tl = scene["treelets"]
bmin_kd = np.asarray(tl["bmin"]); bmax_kd = np.asarray(tl["bmax"])
real = bmax_kd[:, 0] < 1e30
exec_model(bmin_kd[real], bmax_kd[real], "kd-median cells (production)")

# Morton cells
mcode = morton(q)
exec_model(*cell_bounds_from_order(np.argsort(mcode, kind="stable")),
           "morton-order cells (device-rebuildable)")
