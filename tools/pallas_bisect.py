"""Bisect the compiled-mode Pallas miscompare: three mini-kernels.

A) no DMA, no loop: wplanes block loaded via BlockSpec, single treelet.
B) manual DMA of one fixed treelet, no loop.
C) fori_loop over all treelets with static ids.

Each compares (t, slot) against host math on the same data.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
K = 128


def host_expected(rays8, wplanes, tids):
    """Reference result in numpy: intersect all rays against treelets tids."""
    o4 = np.concatenate([rays8[0:3], np.ones((1, BLOCK), np.float32)], 0)
    d4 = np.concatenate([rays8[4:7], np.zeros((1, BLOCK), np.float32)], 0)
    best_t = rays8[3].copy()
    best_slot = np.full(BLOCK, -1, np.int64)
    for tid in tids:
        wp = wplanes[tid]
        wu, wv, ww = wp[0:4], wp[4:8], wp[8:12]
        ou, du = o4.T @ wu, d4.T @ wu
        ov, dv = o4.T @ wv, d4.T @ wv
        ow, dw = o4.T @ ww, d4.T @ ww
        valid = np.abs(dw) > 1e-12
        t = -ow / np.where(valid, dw, 1.0)
        u = ou + t * du
        v = ov + t * dv
        hit = valid & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) \
            & (t < best_t[:, None])
        th = np.where(hit, t, 1e30)
        tmin = th.min(1)
        kbest = th.argmin(1)
        better = tmin < best_t
        best_slot = np.where(better, tid * K + kbest, best_slot)
        best_t = np.where(better, tmin, best_t)
    return best_t, best_slot


def xf(a, w):
    return jax.lax.dot_general(a, w, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def intersect_block(o4h, d4h, wp, best_t, best_slot, tid):
    wu, wv, ww = wp[0:4, :], wp[4:8, :], wp[8:12, :]
    ou, du = xf(o4h, wu), xf(d4h, wu)
    ov, dv = xf(o4h, wv), xf(d4h, wv)
    ow, dw = xf(o4h, ww), xf(d4h, ww)
    valid = jnp.abs(dw) > 1e-12
    t = -ow / jnp.where(valid, dw, 1.0)
    u = ou + t * du
    v = ov + t * dv
    hit = (valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > 1e-4) & (t < best_t))
    th = jnp.where(hit, t, 1e30)
    tmin = jnp.min(th, axis=1, keepdims=True)
    kbest = jnp.argmin(th, axis=1, keepdims=True).astype(jnp.int32)
    better = tmin < best_t
    new_slot = jnp.where(better, tid * K + kbest, best_slot)
    return jnp.where(better, tmin, best_t), new_slot


def prep(rays8):
    ones = jnp.ones((1, BLOCK), jnp.float32)
    zeros = jnp.zeros((1, BLOCK), jnp.float32)
    o4h = jnp.concatenate([rays8[0:3, :], ones], axis=0)
    d4h = jnp.concatenate([rays8[4:7, :], zeros], axis=0)
    t0 = rays8[3:4, :].T
    return o4h, d4h, t0


def write_out(t_out, slot_out, best_t, best_slot):
    t_out[0, :, :] = jnp.broadcast_to(best_t, (BLOCK, 8))
    slot_out[0, :, :] = jnp.broadcast_to(best_slot, (BLOCK, 8))


def kernel_a(rays_ref, wp_ref, t_out, slot_out):
    o4h, d4h, t0 = prep(rays_ref[:])
    bt, bs = intersect_block(o4h, d4h, wp_ref[0], t0,
                             jnp.full((BLOCK, 1), -1, jnp.int32), 0)
    write_out(t_out, slot_out, bt, bs)


def kernel_b(rays_ref, wp_hbm, t_out, slot_out, wp_s, sem):
    o4h, d4h, t0 = prep(rays_ref[:])
    c = pltpu.make_async_copy(wp_hbm.at[0], wp_s.at[0], sem.at[0])
    c.start()
    c.wait()
    bt, bs = intersect_block(o4h, d4h, wp_s[0], t0,
                             jnp.full((BLOCK, 1), -1, jnp.int32), 0)
    write_out(t_out, slot_out, bt, bs)


def kernel_c(n_treelets, rays_ref, wp_hbm, t_out, slot_out, wp_s, sem):
    o4h, d4h, t0 = prep(rays_ref[:])

    def dma(slot, tid):
        return pltpu.make_async_copy(wp_hbm.at[tid], wp_s.at[slot],
                                     sem.at[slot])

    dma(0, 0).start()

    def body(i, carry):
        bt, bs = carry
        slot = jnp.remainder(i, 2)
        nxt = jnp.remainder(i + 1, 2)

        @pl.when(i + 1 < n_treelets)
        def _():
            dma(nxt, i + 1).start()

        dma(slot, i).wait()
        return intersect_block(o4h, d4h, wp_s[slot], bt, bs, i)

    bt, bs = jax.lax.fori_loop(
        0, n_treelets, body,
        (t0, jnp.full((BLOCK, 1), -1, jnp.int32)))
    write_out(t_out, slot_out, bt, bs)


def main():
    rng = np.random.default_rng(0)
    n_treelets = 8
    tris = n_treelets * K
    v0 = rng.uniform(-5, 5, (tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-.6, .6, (tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-.6, .6, (tris, 3)).astype(np.float32)
    from rfw_tpu.ops.intersect import woop_matrices
    from rfw_tpu.render.scene_data import _woop_planes
    w = woop_matrices(v0, v1, v2)
    wplanes = _woop_planes(w, K)

    o = rng.uniform(-8, 8, (BLOCK, 3)).astype(np.float32)
    d = rng.normal(size=(BLOCK, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays8 = np.zeros((8, BLOCK), np.float32)
    rays8[0:3] = o.T
    rays8[3] = 1e30
    rays8[4:7] = d.T

    out_shape = [jax.ShapeDtypeStruct((1, BLOCK, 8), jnp.float32),
                 jax.ShapeDtypeStruct((1, BLOCK, 8), jnp.int32)]
    out_specs = [pl.BlockSpec((1, BLOCK, 8), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)] * 2
    grid = (1,)

    results = {}

    # A: BlockSpec-loaded single treelet
    fa = pl.pallas_call(
        kernel_a, out_shape=out_shape, grid=grid,
        in_specs=[pl.BlockSpec((8, BLOCK), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16, K), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs)
    t0 = time.time()
    ta, sa = jax.jit(fa)(jnp.asarray(rays8), jnp.asarray(wplanes))
    ta.block_until_ready()
    print(f"A compiled+ran in {time.time()-t0:.0f}s", flush=True)
    results["A"] = (np.asarray(ta)[0, :, 0], np.asarray(sa)[0, :, 0], [0])

    # B: manual DMA single treelet
    fb = pl.pallas_call(
        kernel_b, out_shape=out_shape, grid=grid,
        in_specs=[pl.BlockSpec((8, BLOCK), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((2, 16, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    t0 = time.time()
    tb, sb = jax.jit(fb)(jnp.asarray(rays8), jnp.asarray(wplanes))
    tb.block_until_ready()
    print(f"B compiled+ran in {time.time()-t0:.0f}s", flush=True)
    results["B"] = (np.asarray(tb)[0, :, 0], np.asarray(sb)[0, :, 0], [0])

    # C: fori loop over all treelets
    fc = pl.pallas_call(
        functools.partial(kernel_c, n_treelets), out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec((8, BLOCK), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((2, 16, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    t0 = time.time()
    tc, sc = jax.jit(fc)(jnp.asarray(rays8), jnp.asarray(wplanes))
    tc.block_until_ready()
    print(f"C compiled+ran in {time.time()-t0:.0f}s", flush=True)
    results["C"] = (np.asarray(tc)[0, :, 0], np.asarray(sc)[0, :, 0],
                    list(range(n_treelets)))

    for name, (t, s, tids) in results.items():
        et, es = host_expected(rays8, wplanes, tids)
        t_ok = np.allclose(t, et, rtol=1e-4, atol=1e-4)
        s_ok = (s == es).mean()
        print(f"{name}: t match={t_ok} slot agree={s_ok:.4f} "
              f"(hits {int((es >= 0).sum())})", flush=True)
        if not t_ok:
            bad = np.nonzero(~np.isclose(t, et, rtol=1e-4, atol=1e-4))[0][:5]
            print("   first bad lanes:", bad, t[bad], et[bad], flush=True)


if __name__ == "__main__":
    main()
