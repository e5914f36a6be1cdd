"""Transposed visit-kernel microbench (round-5 scenario E de-risk).

The candidate post-visit core keeps per-GROUP visit lists (no pair
sorts) but shrinks the group to 128 rays ON LANES and the cell to K
triangles ON SUBLANES, so a visit is a (K, 128) dense op — 4096 slots at
K=32 vs the production kernel's 32768 — with a 2 KB contiguous DMA per
visit. tools/r5_core_sim.py prices its kernel 3.3x below production IF
the per-visit fixed cost stays small; this benchmark measures that fixed
cost with REAL pipelined DMAs from a (T, 16, K) HBM plane array.

Per program: 2 sub-blocks of 128 rays advance in lockstep, each with its
own SMEM visit list (ids synthetic, cycling through T) — the same
structure the production driver would use. Sweep n_step → linear fit
gives marginal us/visit (both sub-blocks' dense work + 2 DMAs) and
us/program fixed.

Usage: python tools/r5_tkernel_micro.py [--nb 2048] [--ks 16,32,64]
       [--steps 8,32,128]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128     # rays per sub-block (on lanes)
SUB = 2         # sub-blocks per program (256 rays total, like production)
PIPE = 8


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.time() - t0) / reps * 1000.0


def make_kernel(k_size: int, n_step: int, t_cells: int):
    def kernel(ids_ref,            # SMEM (SUB*8, n_step) visit ids
               rays_ref,           # VMEM (SUB*8, LANES)
               wg_hbm,             # ANY (T, 16, k_size)
               t_out,              # (1, 8, SUB*LANES)
               bt_s, bs_s, wp_s, sems):
        rays = rays_ref[:]

        def dma(sub, slot, g):
            return pltpu.make_async_copy(
                wg_hbm.at[g], wp_s.at[sub, slot], sems.at[sub, slot])

        def gid(sub, i):
            return ids_ref[sub * 8, jnp.minimum(i, n_step - 1)]

        for sub in range(SUB):
            for k in range(PIPE - 1):
                @pl.when(k < n_step)
                def _(sub=sub, k=k):
                    dma(sub, k, gid(sub, k)).start()

        def body(state):
            i, _ = state
            slot = jnp.remainder(i, PIPE)
            for sub in range(SUB):
                @pl.when(i + PIPE - 1 < n_step)
                def _(sub=sub):
                    dma(sub, jnp.remainder(i + PIPE - 1, PIPE),
                        gid(sub, i + PIPE - 1)).start()
                dma(sub, slot, gid(sub, i)).wait()
                wp = wp_s[sub, slot]                 # (16, 128) padded
                r0 = sub * 8
                o_rows = rays[r0:r0 + 3, :]          # (3, LANES)
                d_rows = rays[r0 + 4:r0 + 7, :]

                def col(c):
                    # full-width lane transpose + static SUBLANE slice
                    # (lane slices must be 128-aligned; sublane slices
                    # only 8-aligned — the Mosaic constraint that killed
                    # the (16, k) DMA layout)
                    return wp[c:c + 1, :].T[0:k_size]   # (k_size, 1)

                def xf_o(c0):
                    # plane col (k,1) x ray row (1,LANES) outer FMAs
                    a = col(c0 + 3) + col(c0) * o_rows[0:1, :]
                    for q in range(1, 3):
                        a = a + col(c0 + q) * o_rows[q:q + 1, :]
                    return a                          # (k_size, LANES)

                def xf_d(c0):
                    a = col(c0) * d_rows[0:1, :]
                    for q in range(1, 3):
                        a = a + col(c0 + q) * d_rows[q:q + 1, :]
                    return a

                ou, du = xf_o(0), xf_d(0)
                ov, dv = xf_o(4), xf_d(4)
                ow, dw = xf_o(8), xf_d(8)
                valid = jnp.abs(dw) > 1e-12
                t = -ow / jnp.where(valid, dw, 1.0)
                u = ou + t * du
                v = ov + t * dv
                hit = (valid & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > 1e-5))
                t_hit = jnp.where(hit, t, 1e30)
                # per-ray (lane) commit: min over the K sublanes
                tmin = jnp.min(t_hit, axis=0, keepdims=True)   # (1, LANES)
                kmin = jnp.argmin(t_hit, axis=0, keepdims=True)
                bt = bt_s[sub:sub + 1, :]
                upd = tmin < bt
                bt_s[sub:sub + 1, :] = jnp.where(upd, tmin, bt)
                bs_s[sub:sub + 1, :] = jnp.where(
                    upd, gid(sub, i) * k_size + kmin.astype(jnp.int32),
                    bs_s[sub:sub + 1, :])
            return i + 1, jnp.bool_(False)

        jax.lax.while_loop(lambda s: s[0] < n_step, body,
                           (jnp.int32(0), jnp.bool_(False)))
        out = jnp.concatenate([bt_s[s:s + 1, :] for s in range(SUB)],
                              axis=1)                  # (1, SUB*LANES)
        t_out[0, :, :] = jnp.broadcast_to(out, (8, SUB * LANES))
    return kernel


@functools.partial(jax.jit, static_argnames=("k_size", "n_step", "nb",
                                             "t_cells"))
def run(ids, rays8, wg, k_size, n_step, nb, t_cells):
    kernel = make_kernel(k_size, n_step, t_cells)
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((SUB * 8, n_step), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB * 8, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, SUB * LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        scratch_shapes=[
            pltpu.VMEM((SUB, LANES), jnp.float32),
            pltpu.VMEM((SUB, LANES), jnp.int32),
            pltpu.VMEM((SUB, PIPE, 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((SUB, PIPE)),
        ],
        out_shape=jax.ShapeDtypeStruct((nb, 8, SUB * LANES), jnp.float32),
    )(ids, rays8, wg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=2048)
    ap.add_argument("--ks", default="16,32,64")
    ap.add_argument("--steps", default="8,32,128")
    args = ap.parse_args()
    nb = args.nb
    steps = [int(s) for s in args.steps.split(",")]

    rng = np.random.default_rng(0)
    rays8 = jnp.asarray(
        rng.normal(size=(nb * SUB * 8, LANES)).astype(np.float32))
    print(f"nb={nb} programs x {SUB} sub-blocks of {LANES} rays "
          f"(platform {jax.devices()[0].platform})", flush=True)
    for k_size in [int(x) for x in args.ks.split(",")]:
        t_cells = 305152 // k_size
        wg = jnp.asarray(
            rng.normal(size=(t_cells, 16, 128)).astype(np.float32))
        times = []
        for n_step in steps:
            ids = jnp.asarray(
                rng.integers(0, t_cells, size=(nb * SUB * 8, n_step))
                .astype(np.int32))
            ms = timeit(run, ids, rays8, wg, k_size, n_step, nb, t_cells)
            times.append(ms)
            print(f"  K={k_size:3d} n_step={n_step:4d}: {ms:8.1f} ms "
                  f"({ms*1e3/(nb*n_step):6.3f} us/step "
                  f"[{SUB}x({k_size},{LANES}) + {SUB} DMAs])", flush=True)
        if len(steps) >= 2:
            a, b = np.polyfit(steps, times, 1)
            us_vis = a * 1e3 / nb / SUB
            slots = k_size * LANES
            print(f"  K={k_size:3d} fit: {us_vis:.3f} us/visit marginal "
                  f"({us_vis*1e6/slots:.1f} ps/slot), "
                  f"{b*1e3/nb:.2f} us/program fixed", flush=True)


if __name__ == "__main__":
    main()
