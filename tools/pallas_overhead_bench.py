"""Micro-bench: Pallas per-program fixed cost vs block layouts.

Trivial kernels over an 8100-program grid measuring which in/out block
shapes drive the ~6 µs/program fixed cost of the pair kernel.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 8100
PB = 512


def bench(label, fn, *args, reps=20):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms ({dt/NB*1e6:.2f} us/program)",
          flush=True)
    return out


rays = jnp.zeros((NB * 8, PB), jnp.float32)
col = jnp.zeros((NB * PB, 1), jnp.int32)


def k_base(r_ref, t_out):
    t_out[0, :, :] = jnp.broadcast_to(r_ref[0:1, :] + 1.0, (8, PB))


def run_base(rays):
    return pl.pallas_call(
        k_base, grid=(NB,),
        in_specs=[pl.BlockSpec((8, PB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PB), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 8, PB), jnp.float32),
    )(rays)


bench("rays(8,512) in, (8,512) out", jax.jit(run_base), rays)


def k_col(r_ref, c_ref, t_out):
    t_out[0, :, :] = jnp.broadcast_to(r_ref[0:1, :] + 1.0, (8, PB))


def run_col(rays, col):
    return pl.pallas_call(
        k_col, grid=(NB,),
        in_specs=[pl.BlockSpec((8, PB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((PB, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PB), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 8, PB), jnp.float32),
    )(rays, col)


bench("+ (512,1) column in", jax.jit(run_col), rays, col)


def k_colout(r_ref, t_out, s_out):
    t_out[0, :, :] = jnp.broadcast_to(r_ref[0:1, :] + 1.0, (8, PB))
    s_out[0, :, :] = jnp.zeros((PB, 8), jnp.float32)


def run_colout(rays):
    return pl.pallas_call(
        k_colout, grid=(NB,),
        in_specs=[pl.BlockSpec((8, PB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 8, PB), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, PB, 8), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((NB, 8, PB), jnp.float32),
                   jax.ShapeDtypeStruct((NB, PB, 8), jnp.float32)],
    )(rays)


bench("+ (512,8) minor-8 out", jax.jit(run_colout), rays)

# SMEM window + transpose-reshape in kernel
vis = jnp.zeros((NB, 256), jnp.int32)


def k_smem(v_ref, r_ref, t_out):
    row = jnp.remainder(pl.program_id(0), 8)
    x = (r_ref[:, 0:1] + v_ref[row, 0].astype(jnp.float32))  # (8,1)
    t_out[0, :, :] = jnp.broadcast_to(r_ref[0:1, :] + x[0, 0], (8, PB))


def run_smem(vis, rays):
    return pl.pallas_call(
        k_smem, grid=(NB,),
        in_specs=[pl.BlockSpec((8, 256), lambda b: (b // 8, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, PB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PB), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 8, PB), jnp.float32),
    )(vis, rays)


bench("+ SMEM (8,256) window", jax.jit(run_smem), vis, rays)


def k_reshape(r_ref, t_out, scr):
    scr[:] = r_ref[0:1, :].T + 1.0             # (PB,1) col state
    t_out[0, :, :] = jnp.broadcast_to(scr[:].reshape(1, PB), (8, PB))


def run_reshape(rays):
    return pl.pallas_call(
        k_reshape, grid=(NB,),
        in_specs=[pl.BlockSpec((8, PB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, PB), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 8, PB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PB, 1), jnp.float32)],
    )(rays)


bench("+ (512,1)<->(1,512) transposes", jax.jit(run_reshape), rays)


# dummy while loop with a DMA wait (the pair kernel's control skeleton)
def k_dma(r_ref, hbm_ref, t_out, wp, sem):
    def body(state):
        i, acc = state
        cp = pltpu.make_async_copy(hbm_ref.at[i], wp.at[0], sem.at[0])
        cp.start()
        cp.wait()
        return i + 1, acc + wp[0][0, 0]

    _, acc = jax.lax.while_loop(lambda s: s[0] < 1, body,
                                (jnp.int32(0), jnp.float32(0)))
    t_out[0, :, :] = jnp.broadcast_to(r_ref[0:1, :] + acc, (8, PB))


def run_dma(rays, hbm):
    return pl.pallas_call(
        k_dma, grid=(NB,),
        in_specs=[pl.BlockSpec((8, PB), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, PB), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 8, PB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
    )(rays, hbm)


hbm = jnp.zeros((256, 128, 128), jnp.float32)
bench("+ while loop w/ 64KB DMA", jax.jit(run_dma), rays, hbm)
