"""Phase-level profile of the pair-expansion intersector (v2) on pica-4x.

Times each XLA/Pallas phase separately on realistic primary and bounce ray
streams (center rows of the 1080p frame, which hit geometry).

NOTE: on the axon platform block_until_ready returns early — every bench
forces a tiny device->host readback to measure real completion.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pair_intersect as pri
from rfw_tpu.ops import pallas_intersect as pi
from rfw_tpu.ops.bsdf.common import safe_origin
from rfw_tpu.render.integrator import _tile_permutation
import bench as benchmod

W, ROWS = 1920, 270
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(1920, 1080)
eng.update()
scene = eng._scene
tl = scene["treelets"]
n = W * ROWS
view = rs.camera.get_view().as_pytree()
perm, _ = _tile_permutation(W, n)
pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(W * 405)
O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
O = jnp.asarray(np.asarray(O))
D = jnp.asarray(np.asarray(D))
tm = jnp.full(n, 1e30)
T_S = int(tl["sbmin"].shape[0])


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0])   # force completion
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])   # 1 RTT total
    dt = (time.time() - t0) / reps
    print(f"  {label}: {dt*1000:.1f} ms", flush=True)
    return out


def profile(tag, o, d, t_max):
    print(f"{tag}:", flush=True)
    k_size = int(tl["wplanes"].shape[2])
    win = jnp.zeros(o.shape[0], jnp.float32)
    pb = pri.PBLOCK
    c_max = pri.C_MAX
    n = o.shape[0]

    f_cand = jax.jit(lambda o, d, tm, w: pri.ray_super_candidates(
        o, d, tm, w, tl))
    cand, keys, count, fin = bench("phase1 super candidates", f_cand,
                                   o, d, t_max, win)
    cnp = np.asarray(count)
    print(f"    mean cand {cnp.mean():.2f}, p95 {np.percentile(cnp, 95):.0f},"
          f" max {cnp.max()}, complete {np.asarray(fin).mean():.4f}",
          flush=True)

    f_exp = jax.jit(lambda c: pri.expand_pairs(c, T_S))
    pair_sid, pair_flat = bench("expand+sort pairs", f_exp, cand)
    pc = np.asarray(pair_sid)
    real = int((pc < T_S).sum())
    print(f"    pairs {real} ({real/n:.2f}/ray) of {pc.shape[0]}",
          flush=True)

    f_vis = jax.jit(lambda c: pri.block_visit_lists(c, T_S))
    visits, nvisit = bench("visit lists", f_vis, pair_sid)
    nv = np.asarray(nvisit)
    nbr = max(int(np.ceil(real / pb)), 1)
    print(f"    visits/block mean {nv[:nbr].mean():.2f} "
          f"(real blocks {nbr}/{len(nv)}), total {nv.sum()}", flush=True)

    wsup = pri._wsup(tl, 8)

    def prep(ps, pf, o3, d3, tm3):
        rows8 = jnp.concatenate([o3, tm3[:, None], d3,
                                 jnp.zeros((n, 1))], axis=1)
        pr8 = jnp.where((ps < T_S)[:, None], rows8[pf // c_max], 0.0)
        nb = pr8.shape[0] // pb
        return pr8.reshape(nb, pb, 8).transpose(0, 2, 1).reshape(
            nb * 8, pb)

    f_prep = jax.jit(prep)
    rays8 = bench("pair-ray gather+pack", f_prep, pair_sid, pair_flat,
                  o, d, t_max)

    f_kern = jax.jit(lambda r8, sc, v, nv2: pri._run_pair_kernel(
        r8, sc, v, nv2, wsup, 8, k_size,
        float(cfg.t_epsilon), False))
    t_pair, slot_pair = bench("kernel only", f_kern, rays8,
                              pair_sid.reshape(-1, 1), visits, nvisit)

    def combine(t_pair, slot_pair, pair_flat):
        _, t_back, s_back = jax.lax.sort(
            (pair_flat, t_pair, slot_pair), num_keys=1, is_stable=True)
        t_mat = jnp.where(s_back[:n * c_max].reshape(n, c_max) >= 0,
                          t_back[:n * c_max].reshape(n, c_max), 1e30)
        kmin = jnp.argmin(t_mat, axis=1)
        return jnp.take_along_axis(t_mat, kmin[:, None], axis=1)[:, 0]

    bench("sort-back combine", jax.jit(combine), t_pair, slot_pair,
          pair_flat)

    full = jax.jit(lambda o, d, tm: pri.closest_hit(
        scene, o, d, cfg, t_max=tm, sort=True))
    t, prim, _, _ = bench("FULL closest_hit", full, o, d, t_max, reps=3)
    print(f"    hit-rate {(np.asarray(prim) >= 0).mean():.3f}", flush=True)
    fullah = jax.jit(lambda o, d, dist: pri.any_hit(
        scene, o, d, dist, cfg, sort=True))
    bench("FULL any_hit (dist 20)", fullah, o, d,
          jnp.where(t_max > 0, 20.0, 0.0), reps=3)
    bench("FULL any_hit (dist inf)", fullah, o, d,
          jnp.where(t_max > 0, 1e30, 0.0), reps=3)
    sup = jax.jit(lambda o, d, tm: pi.closest_hit(
        scene, o, d, cfg, t_max=tm, sort=True))
    bench("(super-cell closest_hit)", sup, o, d, t_max, reps=3)
    supa = jax.jit(lambda o, d, dist: pi.any_hit(
        scene, o, d, dist, cfg, sort=True))
    bench("(super-cell any_hit dist 20)", supa, o, d,
          jnp.where(t_max > 0, 20.0, 0.0), reps=3)
    return t, prim


t, prim = profile("PRIMARY (coherent)", O, D, tm)
hit = np.asarray(prim) >= 0

hp = O + D * jnp.where(jnp.asarray(hit), t, 0.0)[:, None]
so = safe_origin(hp, -D)
g = np.random.default_rng(0)
nd = g.normal(size=(n, 3)).astype(np.float32)
nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
tmb = jnp.where(jnp.asarray(hit), 1e30, 0.0)
profile(f"BOUNCE (scattered, {100*(1-hit.mean()):.0f}% dead)", so,
        jnp.asarray(nd), tmb)
