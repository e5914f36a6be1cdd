"""Micro-bench: per-row smallest-k selection strategies on TPU.

The pair intersector needs, per ray: the <=k lowest-cid cells whose AABB the
ray crosses, out of ~192-256 slab-tested columns. Options measured:
  a) slab+count only (floor)
  b) lax.top_k
  c) full row jnp.sort, take [:k]
  d) cumsum-rank + flat scatter
  e) cumsum-rank + one-hot matmul (rank -> slot)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 19
T = 256
K = 16
rng = np.random.default_rng(0)

o = jnp.asarray(rng.uniform(-10, 10, (N, 3)).astype(np.float32))
d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
bmin = jnp.asarray(rng.uniform(-12, 8, (T, 3)).astype(np.float32))
bmax = bmin + jnp.asarray(rng.uniform(0.5, 3.0, (T, 3)).astype(np.float32))


def slab_mask(o, d):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t1 = (bmin[None] - o[:, None]) * inv[:, None]
    t2 = (bmax[None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t1, t2), -1)
    tf = jnp.min(jnp.maximum(t1, t2), -1)
    return (tf >= jnp.maximum(tn, 0.0)) & (tn < 1e30)


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


cols = jnp.arange(T, dtype=jnp.int32)

m = bench("a) slab+count", jax.jit(
    lambda o, d: jnp.sum(slab_mask(o, d), -1)), o, d)
print("   mean hits/row:", float(np.asarray(m).mean()))

bench("b) slab+top_k", jax.jit(lambda o, d: jax.lax.top_k(
    -jnp.where(slab_mask(o, d), cols.astype(jnp.float32), 3e38), K)), o, d)


def row_sort(o, d):
    key = jnp.where(slab_mask(o, d), cols, T)
    return jnp.sort(key, axis=-1)[:, :K]


bench("c) slab+row sort", jax.jit(row_sort), o, d)


def scatter_rank(o, d):
    hit = slab_mask(o, d)
    rank = jnp.cumsum(hit, -1) - 1
    keep = hit & (rank < K)
    flat = jnp.where(keep, jnp.arange(N, dtype=jnp.int32)[:, None] * K
                     + rank, N * K)
    out = jnp.full(N * K + 1, -1, jnp.int32)
    out = out.at[flat.reshape(-1)].set(
        jnp.broadcast_to(cols, hit.shape).reshape(-1), mode="drop")
    return out[:N * K].reshape(N, K)


bench("d) slab+cumsum+scatter", jax.jit(scatter_rank), o, d)


def onehot_mm(o, d):
    hit = slab_mask(o, d)
    rank = jnp.cumsum(hit, -1) - 1
    keep = hit & (rank < K)
    oh = keep[..., None] & (rank[..., None] == jnp.arange(K))  # (N,T,K)
    vals = jnp.einsum("ntk,t->nk", oh.astype(jnp.float32),
                      cols.astype(jnp.float32) + 1.0)
    return vals.astype(jnp.int32) - 1


bench("e) slab+onehot matmul", jax.jit(onehot_mm), o, d)

# sanity: c == d
rc = np.asarray(jax.jit(row_sort)(o, d))
rd = np.asarray(jax.jit(scatter_rank)(o, d))
rc = np.where(rc >= T, -1, rc)
print("c==d:", (np.sort(np.where(rc < 0, 10**9, rc), -1)
                == np.sort(np.where(rd < 0, 10**9, rd), -1)).all())
