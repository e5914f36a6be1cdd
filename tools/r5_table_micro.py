"""Round-5 pair-table primitive costs (axon-safe timing).

Prices the exact XLA ops the candidate cell-major pair core would issue
per 518k-ray chunk, so the offline cost model (tools/r5_core_sim.py)
uses today's constants instead of round-2 folklore:

  sort1   : 1-op u32 sort            (pair grouping, packed key)
  sort2   : u32 key + 1 u32 carry    (cell key + pair flat)
  sort3   : u32 key + f32,i32 carry  (combine: flat + t + slot)
  sortc   : 1 key + 9 carries        (sort-carry everything variant)
  gather8 : (P,) indexed rows from a (518k, 8) f32 table (ray rows)
  childtab: per-block child-bounds gather (NB, L, 4, 6) + per-ray slab
            against 4L child slots + crossed-count cumsum + W one-hot
            extractions — the per-ray child-candidate enum pipeline

Timing: rep loop + ONE trailing np.asarray readback (block_until_ready
returns early on the axon platform — STATUS.md operational notes).

Usage: python tools/r5_table_micro.py [--cpu]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

rng = np.random.default_rng(0)


def bench(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.time() - t0) / reps * 1000
    print(f"{label}: {dt:8.2f} ms", flush=True)
    return dt


print(f"platform {jax.devices()[0].platform}", flush=True)

for n in (2 << 20, 4 << 20, 8 << 20):
    tag = f"{n >> 20}M"
    k = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int64)
                    .astype(np.uint32))
    c1 = jnp.asarray(rng.integers(0, n, n, dtype=np.int64)
                     .astype(np.uint32))
    f1 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    i1 = jnp.asarray(rng.integers(0, n, n, dtype=np.int64)
                     .astype(np.int32))
    bench(f"sort1 u32 {tag}",
          jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)), k)
    bench(f"sort2 u32+u32 {tag}",
          jax.jit(lambda k, c: jax.lax.sort((k, c), num_keys=1)), k, c1)
    bench(f"sort3 u32+f32+i32 {tag}",
          jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1)),
          k, f1, i1)
    if n <= 4 << 20:
        cs = [jnp.asarray(rng.normal(size=n).astype(np.float32))
              for _ in range(9)]
        bench(f"sortc 1k+9c {tag}",
              jax.jit(lambda k, *cs: jax.lax.sort((k,) + cs, num_keys=1)),
              k, *cs)
    tbl = jnp.asarray(rng.normal(size=(518400, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 518400, n).astype(np.int32))
    bench(f"gather8 {tag} rows", jax.jit(lambda i, t: t[i]), idx, tbl)

# --- child-candidate enum pipeline at chunk scale ---
N, L, W = 518400, 128, 12
NB = N // 256
L4 = L * 4
pb = jnp.asarray(rng.normal(size=(NB, L, 4, 6)).astype(np.float32))
o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))


@jax.jit
def childtab(pb, o, d):
    lo = pb[..., 0:3].reshape(NB, 1, L4, 3)
    hi = pb[..., 3:6].reshape(NB, 1, L4, 3)
    o_b = o.reshape(NB, 256, 1, 3)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d).reshape(
        NB, 256, 1, 3)
    t1 = (lo - o_b) * inv
    t2 = (hi - o_b) * inv
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    crossed = tf >= jnp.maximum(tn, 0.0)              # (NB, 256, L4)
    cs = jnp.cumsum(crossed.astype(jnp.int32), axis=-1)
    outs = []
    for w in range(W):
        sel = (cs == (w + 1)) & crossed
        outs.append(jnp.einsum("brl,l->br", sel.astype(jnp.float32),
                               jnp.arange(L4, dtype=jnp.float32)))
    return jnp.stack(outs, -1), crossed.sum()


bench("childtab enum (518k x 512 slots, W=12 extract)", childtab,
      pb, o, d)
