"""Is TPU gather cost per-OP or per-byte? 16 separate (R,) gathers from
(M,) tables vs one (R,16) row gather from an (M,16) table, at shading's
scale (R=518k, M=64 materials / M=305k tris)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

R = 518400


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time()-t0)/reps*1000:.2f} ms", flush=True)


rng = np.random.default_rng(0)
for m, name in ((64, "materials M=64"), (305098, "triangles M=305k")):
    idx = jnp.asarray(rng.integers(0, m, R).astype(np.int32))
    tables = [jnp.asarray(rng.normal(size=m).astype(np.float32))
              for _ in range(16)]
    wide = jnp.asarray(rng.normal(size=(m, 16)).astype(np.float32))
    wide24 = jnp.asarray(rng.normal(size=(m, 24)).astype(np.float32))

    f_sep = jax.jit(lambda i, *ts: sum(t[i] for t in ts))
    f_one = jax.jit(lambda i, w: w[i].sum(axis=-1))
    f_one24 = jax.jit(lambda i, w: w[i].sum(axis=-1))
    print(f"--- {name}", flush=True)
    bench("16 separate (R,) gathers", f_sep, idx, *tables)
    bench("one (R,16) row gather", f_one, idx, wide)
    bench("one (R,24) row gather", f_one24, idx, wide24)
