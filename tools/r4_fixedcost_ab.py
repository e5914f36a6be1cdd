"""Round-4 fixed-cost + MXU-probe microbench (real chip).

Measures the VERDICT r3 #2/#3 levers in isolation:

  A. compaction sort at frame scale (2.07M rows, 2 keys + 18 carries):
     u32 keys vs f32-BITCAST keys. Any u32 key < 2^31 bitcasts to a
     non-negative finite/subnormal f32 whose IEEE ordering equals the
     integer ordering, so the permutation is IDENTICAL — only the
     comparator cost changes (sort_microbench: f32 ~ u16 < u32).
  B. the same at half size (the prefix-compaction candidate: depth>=2
     compacts only need to re-sort the rows the previous depth touched).
  C. finalize sort (1 pid key + 3 radiance carries) u32 vs f32 key.
  D. per-launch sort-carry (518k rows, 2 keys + 7 carries) u32 vs f32.
  E. bf16 MXU visit-transform probe: the Woop transform as a per-visit
     (256, 8) @ (8, 768) bf16 matmul (K = 8 is a CEILING: any per-
     (ray, tri) bilinear form contracts over ray features = 8 floats,
     so the 128x128 systolic array runs at <= 8/128 utilization).
     Measures achievable ms for one 518k-lane chunk's worth of visits
     (~2025 blocks x ~122 visits) against the VPU visit kernel's
     measured ~1.4 us/visit (~350 ms/chunk). If the probe can't beat
     ~3x, the conservative-prefilter idea is dead before margin logic.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

rng = np.random.default_rng(0)


def bench(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])  # sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])  # one RTT
    dt = (time.time() - t0) / reps * 1000
    print(f"{label}: {dt:.1f} ms", flush=True)
    return dt


N = 1920 * 1080          # frame lanes
NC = 518400              # chunk lanes


def mk_carries(n, c):
    return tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                 for _ in range(c))


def sort_u32(keys, lane, *carries):
    return jax.lax.sort((keys, lane) + carries, dimension=0, num_keys=2)


_F32_OFF = np.uint32(0x3F800000)   # 1.0f — lifts every key out of the
#                                    subnormal range (FTZ flushes
#                                    subnormals: distinct tiny keys would
#                                    compare EQUAL); addition of a
#                                    constant is order-preserving and
#                                    keys < 2^29 stay finite (< 2^63 exp)


def sort_f32(keys, lane, *carries):
    kf = jax.lax.bitcast_convert_type(keys + _F32_OFF, jnp.float32)
    lf = jax.lax.bitcast_convert_type(lane + _F32_OFF, jnp.float32)
    return jax.lax.sort((kf, lf) + carries, dimension=0, num_keys=2)


def run_compact(n, label):
    keys = jnp.asarray(rng.integers(0, 1 << 29, n).astype(np.uint32))
    lane = jnp.arange(n, dtype=jnp.uint32)
    carries = mk_carries(n, 18)
    a = bench(f"{label} u32 keys", jax.jit(sort_u32), keys, lane, *carries)
    b = bench(f"{label} f32 keys", jax.jit(sort_f32), keys, lane, *carries)
    # sanity: identical permutation
    ou = jax.jit(sort_u32)(keys, lane, *carries)
    of = jax.jit(sort_f32)(keys, lane, *carries)
    assert (np.asarray(ou[2]) == np.asarray(of[2])).all(), "perm differs!"
    print(f"  -> f32/u32 = {b/a:.3f}", flush=True)


print("== A: frame-scale compact sort (2 keys + 18 carries) ==")
run_compact(N, "A 2.07M")
print("== B: half-prefix compact sort ==")
run_compact(N // 2, "B 1.04M")

print("== C: finalize (1 key + 3 carries) ==")
pid = jnp.asarray(rng.permutation(N).astype(np.uint32))
rad = mk_carries(N, 3)
c_u = bench("C u32 pid", jax.jit(
    lambda p, *r: jax.lax.sort((p,) + r, dimension=0, num_keys=1)),
    pid, *rad)
c_f = bench("C f32 pid", jax.jit(
    lambda p, *r: jax.lax.sort(
        (jax.lax.bitcast_convert_type(p + _F32_OFF, jnp.float32),) + r,
        dimension=0, num_keys=1)), pid, *rad)
print(f"  -> f32/u32 = {c_f/c_u:.3f}", flush=True)

print("== D: launch sort-carry (2 keys + 7 carries, 518k) ==")
keys = jnp.asarray(rng.integers(0, 1 << 29, NC).astype(np.uint32))
lane = jnp.arange(NC, dtype=jnp.uint32)
car7 = mk_carries(NC, 7)
d_u = bench("D u32", jax.jit(sort_u32), keys, lane, *car7)
d_f = bench("D f32", jax.jit(sort_f32), keys, lane, *car7)
print(f"  -> f32/u32 = {d_f/d_u:.3f}", flush=True)

print("== E: bf16 MXU visit-transform probe ==")
V = 2025 * 122           # visits per 518k chunk at ~122/block
VB = 2048                # sub-batch (bounds the (VB,256,768) temp)
V = (V // VB) * VB
R = jnp.asarray(rng.normal(size=(256, 8)).astype(np.float32))
W = jnp.asarray(rng.normal(size=(VB, 8, 768)).astype(np.float32))


@jax.jit
def mxu_batch(R, W):
    # one sub-batch of VB visits: same rays, per-visit planes; reduce
    # to a per-(visit, ray) min so the (VB, 256, 768) product never
    # leaves the fusion (if XLA materializes it anyway, that's the
    # honest HBM cost an XLA formulation pays)
    Rb = R.astype(jnp.bfloat16)
    Wb = W.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        Rb, Wb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (256, VB, 768)
    return jnp.min(out, axis=2)


e_ms = bench(f"E bf16 dot ({VB} visits/batch)", mxu_batch, R, W)
per_visit_us = e_ms * 1000 / VB
total_ms = per_visit_us * V / 1000
print(f"  -> {per_visit_us:.2f} us/visit bf16-MXU; chunk-equivalent "
      f"{total_ms:.0f} ms vs VPU ~350 ms "
      f"({'beats' if total_ms < 350 else 'LOSES'})", flush=True)

# f32 VPU equivalent of the same transform (for the ratio)
@jax.jit
def vpu_batch(R, W):
    out = jax.lax.dot_general(
        R, W, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return jnp.min(out, axis=2)


e2 = bench("E f32-HIGHEST dot (same)", vpu_batch, R, W)
print(f"  -> bf16/f32H = {e_ms/e2:.3f}", flush=True)
