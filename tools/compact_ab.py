"""A/B the between-depth compaction primitive at frame scale (2.07M rows,
18 state columns): the driver pays ~135 ms per compact (x2 per sample).

 a) current: argsort(u32 key) + ONE (m,18) row gather + (n-m,5) tail gather
 b) multi-operand lax.sort: key + 18 (N,) f32 operands permuted in-sort
 c) argsort + full (N,18) row gather (no split)

Run on the real chip. Forced one-readback-after-loop timing (axon's
block_until_ready returns early — STATUS.md operational notes).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 2073600
M = 1140000 // 256 * 256   # typical live rows at d0->d1
rng = np.random.default_rng(0)
keys_np = rng.integers(0, 1 << 29, N, dtype=np.uint32)
state_np = rng.normal(size=(N, 18)).astype(np.float32)
keys = jax.device_put(jnp.asarray(keys_np))
state = jax.device_put(jnp.asarray(state_np))
cols = [jax.device_put(jnp.asarray(state_np[:, i])) for i in range(18)]


@jax.jit
def split_gather(keys, state):
    order = jnp.argsort(keys).astype(jnp.int32)
    front = state[order[:M]]
    tail = state[:, 13:][order[M:]]
    return front, tail


@jax.jit
def multi_sort(keys, *cols):
    return jax.lax.sort((keys,) + cols, dimension=0, num_keys=1)


@jax.jit
def full_gather(keys, state):
    order = jnp.argsort(keys).astype(jnp.int32)
    return state[order]


@jax.jit
def argsort_only(keys):
    return jnp.argsort(keys).astype(jnp.int32)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:28s} {dt:8.1f} ms", flush=True)
    return dt


print(f"N={N} M={M} cols=18 on {jax.devices()[0].platform}", flush=True)
timeit("argsort only", argsort_only, keys)
timeit("a) argsort + split gather", split_gather, keys, state)
timeit("b) 19-operand lax.sort", multi_sort, keys, *cols)
timeit("c) argsort + full gather", full_gather, keys, state)

# -- the sorted-launch round trip (occlusion pattern, N=1M, 7 ray cols):
#    current: argsort -> (n,7) gather -> trace -> (n,1) inv gather
#    cand:    8-operand sort in -> trace -> 2-operand sort back
N2 = 1036800
k2 = jax.device_put(jnp.asarray(keys_np[:N2]))
ray7 = jax.device_put(jnp.asarray(state_np[:N2, :7]))
ray_cols = [jax.device_put(jnp.asarray(state_np[:N2, i]))
            for i in range(7)]
lane = jnp.arange(N2, dtype=jnp.uint32)


@jax.jit
def rt_gather(k, r):
    order = jnp.argsort(k).astype(jnp.int32)
    rs = r[order]                      # (n,7) row gather in
    occ = rs[:, 0] > 0                 # stand-in for the trace
    inv = jnp.argsort(order).astype(jnp.int32)
    return occ[inv]                    # un-permute out


@jax.jit
def rt_sortcarry(k, lane, *rc):
    srt = jax.lax.sort((k, lane) + rc, dimension=0, num_keys=1)
    occ = srt[2] > 0
    _, occ_back = jax.lax.sort((srt[1], occ.astype(jnp.uint32)),
                               dimension=0, num_keys=1)
    return occ_back


timeit("d) occl argsort+2 gathers", rt_gather, k2, ray7)
timeit("e) occl sort-carry both ways", rt_sortcarry, k2, lane, *ray_cols)
