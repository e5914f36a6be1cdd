"""Round-5 post-visit core sim: measure, on a captured bounce stream, the
workload quantities that decide the next intersection architecture
(VERDICT r4 #1): per-ray crossed/exec-to-hit counts and per-group union
execs at MULTIPLE cell granularities K and ray-group sizes g.

Why: the round-4 speed-of-light budget caps the production visit-list
architecture (g=256 block-unions of K=128 cells) at ~23 Mrays/s because
per-ray crossings-to-hit ~8 while block unions execute ~133 visits.
Candidate post-visit designs differ in (a) who owns the visit list (a
g-ray group vs each ray via pair expansion) and (b) the cell granularity
K (128-lane tiling pins the DENSE op's lane width to 128, but a
TRANSPOSED kernel — cell triangles on sublanes, 128 rays on lanes — makes
K=32 cells cost 32x128 dense slots, so finer granularity can pay).

This sim measures the workload side exactly and folds in measured
primitive costs (r2-r4 microbenches; re-pin on chip before deciding):

  scenarios
  ---------
  A  production:          g=256 block-union, K=128, (256,128) visits
  B  sub-block lists:     g in {64,32} own lists, lockstep max-straggler
  C  pairs K=128:         per-ray lists, cell-major sort, (256,128) visits
  D  transposed pairs:    per-ray lists at K in {64,32}, (K,128) visits
  E  transposed unions:   g=128 rays on lanes, group list at K in {64,32}

Usage:
  python tools/r5_core_sim.py [/tmp/d1_stream.npz] [--ns 128] [--seed 0]

The stream must carry origin/direction/tmax/t_hit (capture_d1_tpu.py /
capture_stream_cpu.py format). Cells are REBUILT at each K from the
bench scene's flattened triangles (bench.build_scene is deterministic,
so the cut matches the capture's scene).
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def tri_aabbs_from_bench_scene():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from rfw_tpu.system import RenderSystem
    from rfw_tpu.config import RenderConfig
    import bench as benchmod
    rs = RenderSystem("megakernel", RenderConfig())
    benchmod.build_scene(rs)
    rs.camera.resize(64, 64)
    rs.synchronize()
    scene = rs.context._scene
    tl = scene["treelets"]
    verts = np.asarray(tl["verts"])          # (slots, 3, 3)
    stp = np.asarray(tl["slot_to_prim"])
    valid = stp >= 0
    v = verts[valid]
    return v.min(axis=1).astype(np.float32), v.max(axis=1).astype(np.float32)


def cut_cells(tri_lo, tri_hi, k):
    from rfw_tpu.bvh.wide import spatial_treelets
    t = spatial_treelets(tri_lo, tri_hi, size=k)
    return t.bmin, t.bmax


def block_metrics(o, d, tmax, th, bmin, bmax, gs, ws=(8,)):
    """One 256-ray block vs one cell table. Returns dict of metrics."""
    B = o.shape[0]
    safe = np.where(np.abs(d) < 1e-12,
                    np.where(d < 0, -1e-12, 1e-12), d)
    inv = (1.0 / safe)[:, None]
    t1 = (bmin[None] - o[:, None]) * inv
    t2 = (bmax[None] - o[:, None]) * inv
    ent = np.max(np.minimum(t1, t2), axis=-1)
    ext_ = np.min(np.maximum(t1, t2), axis=-1)
    alive = tmax > 0
    crossed = (ent < np.minimum(ext_, tmax[:, None])) & alive[:, None]
    # per-ray front-to-back exec to exactness: every crossed cell entered
    # before the ray's own exit watermark th (= committed hit t, or tmax
    # for misses) must be tested; later cells are exited exactly.
    needed = crossed & (ent <= th[:, None])
    per_ray_total = crossed.sum(axis=1)
    per_ray_exec = needed.sum(axis=1)
    # exec if each ray walks its own crossed set in the BLOCK's order
    # (cells sorted by block-min entry — what a per-ray pair list built
    # from the block candidate table gives without a per-ray entry sort):
    # count crossed cells up to the LAST needed one in block order
    blk_ent = np.where(crossed, ent, np.inf).min(axis=0)       # (T,)
    border = np.argsort(blk_ent, kind="stable")
    rank = np.empty_like(border)
    rank[border] = np.arange(border.size)
    last_needed = np.where(needed, rank[None, :], -1).max(axis=1)
    per_ray_blk = (crossed & (rank[None, :] <= last_needed[:, None])
                   ).sum(axis=1)
    out = {
        "n_alive": int(alive.sum()),
        "ray_total": per_ray_total[alive],
        "ray_exec": per_ray_exec[alive],
        "ray_exec_blkorder": per_ray_blk[alive],
    }
    # window-quantized per-ray exec (pairs drivers process W cells/pass)
    for w in ws:
        q = np.minimum(-(-per_ray_exec // w) * w, per_ray_total)
        out[f"ray_exec_w{w}"] = q[alive]
    # group metrics: union size and straggler exec for each sub-group
    for g in gs:
        unions, execs = [], []
        for s in range(0, B, g):
            cg = crossed[s:s + g]
            ng = needed[s:s + g]
            u = cg.any(axis=0)
            unions.append(int(u.sum()))
            # group walks its union front-to-back (min entry over group);
            # stops when every ray's watermark precedes the next entry =
            # after the last cell ANY ray still needs
            execs.append(int((ng.any(axis=0)).sum()))
        out[f"union_g{g}"] = np.array(unions)
        out[f"exec_g{g}"] = np.array(execs)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream", nargs="?", default="/tmp/d1_stream.npz")
    ap.add_argument("--ns", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ks", default="128,64,32")
    ap.add_argument("--gs", default="256,128,64,32")
    args = ap.parse_args()

    npz = np.load(args.stream)
    o, d = npz["origin"], npz["direction"]
    tmax, t_hit = npz["tmax"], npz["t_hit"]
    n = o.shape[0]
    th = np.minimum(t_hit, tmax)
    ks = [int(x) for x in args.ks.split(",")]
    gs = [int(x) for x in args.gs.split(",")]

    print("rebuilding bench-scene triangle AABBs ...", flush=True)
    tri_lo, tri_hi = tri_aabbs_from_bench_scene()
    print(f"tris {tri_lo.shape[0]}  stream rays {n} "
          f"live {(tmax > 0).mean():.2f}", flush=True)

    rng = np.random.default_rng(args.seed)
    nb_all = n // 256
    pick = np.sort(rng.choice(nb_all, size=min(args.ns, nb_all),
                              replace=False))

    print(f"\n{'K':>4} {'T':>6} | {'xings/ray':>9} {'exec/ray':>8} "
          f"{'blkord':>6} {'w8/ray':>7} | "
          + " ".join(f"{'u/g'+str(g):>7} {'e/g'+str(g):>7}"
                     for g in gs))
    results = {}
    for k in ks:
        bmin, bmax = cut_cells(tri_lo, tri_hi, k)
        tcells = bmin.shape[0]
        agg = None
        for b in pick:
            rows = slice(b * 256, (b + 1) * 256)
            m = block_metrics(o[rows], d[rows], tmax[rows], th[rows],
                              bmin, bmax, gs)
            if agg is None:
                agg = {key: [val] for key, val in m.items()}
            else:
                for key, val in m.items():
                    agg[key].append(val)
        n_alive = float(np.sum(agg["n_alive"]))
        stat = {}
        for key in agg:
            if key == "n_alive":
                continue
            v = np.concatenate(agg[key])
            stat[key] = v
        results[k] = (tcells, stat, n_alive)
        line = (f"{k:>4} {tcells:>6} | "
                f"{np.mean(stat['ray_total']):>9.1f} "
                f"{np.mean(stat['ray_exec']):>8.1f} "
                f"{np.mean(stat['ray_exec_blkorder']):>6.1f} "
                f"{np.mean(stat['ray_exec_w8']):>7.1f} | ")
        line += " ".join(
            f"{np.mean(stat[f'union_g{g}']):>7.1f} "
            f"{np.mean(stat[f'exec_g{g}']):>7.1f}" for g in gs)
        print(line, flush=True)

    # ---- cost scenarios (constants from r2-r4 on-chip microbenches) ----
    # c_slot: dense VPU cost per (ray,tri) pair slot inside a visit.
    # Calibration point: (256,128) visit = 1.4 us total. Split unknown →
    # bracket with [all-dense] and [half-fixed] hypotheses.
    # sort: ms per Mrow for a 1-key u32 sort (r2: 4M 1-op u32 ~ 15-30 ms
    # → ~4-7 ms/Mrow; multi-carry 1M 9-op = 15.3 ms).
    print("\n-- scenario estimates (ms per 518k-ray chunk; bracket = "
          "[all-dense c_slot=42.7ps | half-fixed c_slot=21.4ps + "
          "0.7us/visit]) --")
    n_chunk = 518400
    scale = n_chunk / 256          # blocks per chunk
    sort_ms_per_mrow = 5.0         # 1-key u32 (re-pin on chip)
    carry_ms_per_mrow_op = 1.7     # extra per carried operand
    for k in ks:
        tcells, stat, n_alive = results[k]
        alive_frac = n_alive / (len(pick) * 256)

        def visits_ms(nvis_per_block, rows, lanes, nblocks=scale):
            slots = rows * lanes
            lo = nvis_per_block * slots * 42.7e-9      # ms, all-dense
            hi = nvis_per_block * (slots * 21.4e-9 + 7e-4)
            return lo * nblocks, hi * nblocks

        # A/B/E: group lists. layout rows x lanes per visit:
        for g in gs:
            e = float(np.mean(stat[f"exec_g{g}"]))
            s_sub = 256 // g
            if k == 128:
                rows, lanes = g, 128          # rays on sublanes
            else:
                rows, lanes = k, min(g, 128)  # transposed: rays on lanes
            # lockstep program of s_sub sub-groups: steps = straggler max
            sub = stat[f"exec_g{g}"].reshape(-1, s_sub)
            steps = float(np.mean(sub.max(axis=1)))
            lo, hi = visits_ms(steps * s_sub, rows, lanes)
            tag = "union" if g == 256 else f"sub-g{g}"
            print(f"K={k:<4} {tag:<8} rows x lanes=({rows},{lanes}) "
                  f"exec/g={e:6.1f} steps={steps:6.1f} "
                  f"kernel {lo:6.0f}..{hi:6.0f} ms")

        # C/D: pairs — per-ray lists, cell-major execution
        p_per_ray = float(np.mean(stat["ray_exec_w8"]))
        p_rows = n_chunk * alive_frac * p_per_ray
        if k == 128:
            rows, lanes = 256, 128
            pairs_per_visit = 256
        else:
            rows, lanes = k, 128
            pairs_per_visit = 128
        nvis = p_rows / pairs_per_visit * 1.15     # cell-padding waste
        lo, hi = visits_ms(1.0, rows, lanes, nvis)
        # tables: expand sort (1 key + 1 carry) + combine sort back
        # (1 key + 2 carries) on the pair rows, + enum row machinery
        mr = p_rows / 1e6
        t_sort = mr * (sort_ms_per_mrow + carry_ms_per_mrow_op)
        t_comb = mr * (sort_ms_per_mrow + 2 * carry_ms_per_mrow_op)
        t_gather = p_rows * 32 / 5.6e9 * 1e3       # ray rows @5.6 GB/s
        print(f"K={k:<4} pairs    rows x lanes=({rows},{lanes}) "
              f"P={p_rows/1e6:5.1f}M kernel {lo:6.0f}..{hi:6.0f} ms "
              f"+ tables ~{t_sort + t_comb + t_gather:5.0f} ms "
              f"(sort {t_sort:.0f} comb {t_comb:.0f} "
              f"gather {t_gather:.0f})")


if __name__ == "__main__":
    main()
