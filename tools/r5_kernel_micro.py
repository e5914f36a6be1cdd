"""Round-5 visit-kernel microbench: where do the 1.4 us/visit go?

The r4 speed-of-light budget priced the (256,128) dense Woop visit at
~1.4 us — "~50% of VPU FMA issue at ~42 ops/pair" — and every ceiling
derived from it. Before accepting ~23 Mrays/s as the architecture cap,
split that constant:

  raw   : pure (256,128) FMA chain          → the VPU issue-rate floor
  v3    : Woop transforms only (no div, no commit)  → dense floor
  v0    : production inner body (div + running-min commit)
  v1    : approx-reciprocal t (pl.reciprocal) — winner still refined
          in exact f32 outside the kernel, but the COMMIT order can
          differ on near-ties, so v1 is only viable if hit parity holds
  v2    : division-free cross-multiplied commit (num/den tracking; the
          r2 analysis guessed ~50 vs ~42 ops — measure, don't guess)

Each runs as a compute-only kernel (planes resident in VMEM, no DMA) over
a while_loop of n_step visits, at several n_step values → linear fit
gives per-visit cost + per-program overhead. Compare against the REAL
kernel (_run_visit_kernel with uniform synthetic lists) to attribute
DMA/SMEM/loop overhead.

Usage: python tools/r5_kernel_micro.py [--nb 2048] [--steps 8,32,128]
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

BLOCK, K = 256, 128


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.time() - t0) / reps * 1000.0, out


def make_kernel(variant: str, n_step: int):
    def kernel(rays_ref, wp_ref, t_out, btk_s, bgk_s):
        rays = rays_ref[:]
        t_max0 = rays[3:4, :].T
        ones = jnp.ones((1, BLOCK), jnp.float32)
        o4 = jnp.concatenate([rays[0:3, :], ones], axis=0)
        d3 = rays[4:7, :]
        btk_s[:] = jnp.broadcast_to(t_max0, (BLOCK, K))
        bgk_s[:] = jnp.zeros((BLOCK, K), jnp.int32)

        def body(state):
            i, acc = state
            wp = wp_ref[0]

            def xf_o(r0):
                a = wp[r0 + 3:r0 + 4, :] + o4[0:1, :].T * wp[r0:r0 + 1, :]
                for q in range(1, 3):
                    a = a + o4[q:q + 1, :].T * wp[r0 + q:r0 + q + 1, :]
                return a

            def xf_d(r0):
                a = d3[0:1, :].T * wp[r0:r0 + 1, :]
                for q in range(1, 3):
                    a = a + d3[q:q + 1, :].T * wp[r0 + q:r0 + q + 1, :]
                return a

            ou, du = xf_o(0), xf_d(0)
            ov, dv = xf_o(4), xf_d(4)
            ow, dw = xf_o(8), xf_d(8)

            if variant == "raw":
                # pure FMA chain of comparable op count (~40), no
                # selects/compares — the VPU issue ceiling
                a = ou
                for _ in range(11):
                    a = a * dw + du
                acc = acc + a
            elif variant == "v3":
                # transforms only + plain min — no div, no commit logic
                acc = acc + jnp.minimum(jnp.minimum(ou, ov),
                                        jnp.minimum(ow, du + dv + dw))
            elif variant == "v0":
                valid = jnp.abs(dw) > 1e-12
                t = -ow / jnp.where(valid, dw, 1.0)
                u = ou + t * du
                v = ov + t * dv
                hit = (valid & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > 1e-5))
                t_hit = jnp.where(hit, t, 1e30)
                bt_h = btk_s[:]
                upd = t_hit < bt_h
                btk_s[:] = jnp.where(upd, t_hit, bt_h)
                bgk_s[:] = jnp.where(upd, i, bgk_s[:])
            elif variant == "v1":
                valid = jnp.abs(dw) > 1e-12
                try:
                    r = pl.reciprocal(jnp.where(valid, dw, 1.0),
                                      approx=True)
                except Exception:
                    r = 1.0 / jnp.where(valid, dw, 1.0)
                t = -ow * r
                u = ou + t * du
                v = ov + t * dv
                hit = (valid & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > 1e-5))
                t_hit = jnp.where(hit, t, 1e30)
                bt_h = btk_s[:]
                upd = t_hit < bt_h
                btk_s[:] = jnp.where(upd, t_hit, bt_h)
                bgk_s[:] = jnp.where(upd, i, bgk_s[:])
            elif variant == "v2":
                # division-free: t = num/den with den = |dw| (sign folded
                # into num), compares cross-multiplied. Track per-lane
                # best as (num, den) pairs in btk (num) / f32-den via
                # bgk reinterpret — here just extra scratch-free algebra:
                s = jnp.sign(dw)
                den = jnp.abs(dw)                      # >= 0
                num = -ow * s                          # t = num/den
                valid = den > 1e-12
                # u >= 0  ⇔  ou*den + num*du >= 0 ; v likewise;
                # u+v <= 1 ⇔ (ou+ov)*den + num*(du+dv) <= den
                u_n = ou * den + num * du
                v_n = ov * den + num * dv
                hit = (valid & (u_n >= 0.0) & (v_n >= 0.0)
                       & (u_n + v_n <= den) & (num > 1e-5 * den))
                # commit: num/den < bt  ⇔  num < bt*den
                bt_h = btk_s[:]
                upd = hit & (num < bt_h * den)
                # store EXACT t for committed lanes (division only on
                # commit — masked, still executed per lane: same cost;
                # the point of v2 is replacing the always-on div)
                btk_s[:] = jnp.where(upd, num / jnp.where(valid, den, 1.0),
                                     bt_h)
                bgk_s[:] = jnp.where(upd, i, bgk_s[:])
            return i + 1, acc

        _, acc = jax.lax.while_loop(
            lambda s: s[0] < n_step, body,
            (jnp.int32(0), jnp.zeros((BLOCK, K), jnp.float32)))
        if variant in ("raw", "v3"):
            t_out[0, :, :] = jnp.broadcast_to(
                jnp.min(acc, axis=1, keepdims=True).reshape(1, BLOCK),
                (8, BLOCK))
        else:
            t_out[0, :, :] = jnp.broadcast_to(
                jnp.min(btk_s[:], axis=1, keepdims=True).reshape(1, BLOCK),
                (8, BLOCK))
    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "n_step", "nb"))
def run(rays8, wp, variant, n_step, nb):
    kernel = make_kernel(variant, n_step)
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, BLOCK), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, K), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        scratch_shapes=[pltpu.VMEM((BLOCK, K), jnp.float32),
                        pltpu.VMEM((BLOCK, K), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((nb, 8, BLOCK), jnp.float32),
    )(rays8, wp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=2048)
    ap.add_argument("--steps", default="8,32,128")
    ap.add_argument("--variants", default="raw,v3,v0,v1,v2")
    args = ap.parse_args()
    nb = args.nb
    steps = [int(s) for s in args.steps.split(",")]

    rng = np.random.default_rng(0)
    rays8 = jnp.asarray(rng.normal(size=(nb * 8, BLOCK)).astype(np.float32))
    wp = jnp.asarray(rng.normal(size=(1, 16, K)).astype(np.float32))

    print(f"nb={nb} blocks, visits/block sweep {steps} "
          f"(platform {jax.devices()[0].platform})", flush=True)
    for variant in args.variants.split(","):
        times = []
        for n_step in steps:
            ms, _ = timeit(run, rays8, wp, variant, n_step, nb)
            times.append(ms)
            us_vis = ms * 1e3 / (nb * n_step)
            print(f"  {variant:4s} n_step={n_step:4d}: {ms:8.1f} ms "
                  f"({us_vis:6.3f} us/visit)", flush=True)
        if len(steps) >= 2:
            # linear fit: ms = a * n_step + b
            a, b = np.polyfit(steps, times, 1)
            slots = BLOCK * K
            ops = a * 1e-3 / nb / slots   # s per slot
            print(f"  {variant:4s} fit: {a*1e3/nb:.3f} us/visit marginal, "
                  f"{b*1e3/nb:.2f} us/program fixed "
                  f"({ops*1e12:.1f} ps/slot → "
                  f"{42/ops/1e12:.2f} Tops/s at 42 ops/pair)", flush=True)


if __name__ == "__main__":
    main()
