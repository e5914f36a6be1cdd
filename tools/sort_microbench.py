"""Micro-bench: lax.sort (key,val) and related primitives at pair scales."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


for n in (1 << 20, 2 << 20, 4 << 20, 8 << 20):
    k = jnp.asarray(rng.integers(0, 256, n).astype(np.int32))
    v = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    bench(f"sort kv n={n>>20}M", jax.jit(
        lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False)),
        k, v)
    bench(f"sort kv stable n={n>>20}M", jax.jit(
        lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)),
        k, v)
    # gather rows (P,8) from (N,8) by val
    tbl = jnp.asarray(rng.normal(size=(1 << 19, 8)).astype(np.float32))
    bench(f"gather (n,8) rows n={n>>20}M", jax.jit(
        lambda v, t: t[v & ((1 << 19) - 1)]), v, tbl)
    seg = jnp.asarray(np.sort(rng.integers(0, 1 << 19, n)).astype(np.int32))
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    bench(f"segment_min n={n>>20}M", jax.jit(
        lambda x, s: jax.ops.segment_min(x, s, num_segments=(1 << 19) + 1)),
        x, seg)

n = 1 << 19
h = jnp.asarray((rng.random((n, 256)) < 0.01))
bench("cumsum over N axis (512k,256)", jax.jit(
    lambda h: jnp.cumsum(h, axis=0)), h)
bench("cumsum over T axis (512k,256)", jax.jit(
    lambda h: jnp.cumsum(h, axis=1)), h)
