"""Minimal-repro bisect of the pure-jnp TPU-worker crash (VERDICT r4 #5).

tools/tlas_scale_ab.py (lax.scan premask + while_loop(cond(traverse_wide))
— pure jnp, no Pallas) reproducibly crashed the axon TPU worker at first
execution, 3/3 attempts including I=4. This tool runs progressively
smaller variants, EACH IN A SUBPROCESS (a worker crash must not kill the
sweep; each attempt claims the chip fresh), and reports which construct
is the smallest that crashes:

  v1  full        : premask scan + while_loop(cond(traverse_wide))  [= AB tool]
  v2  no-scan     : while_loop(cond(traverse_wide)), premask computed unchunked
  v3  no-cond     : while_loop(traverse_wide) without the lax.cond skip
  v4  traverse    : one traverse_wide call (vmapped while_loop) alone
  v5  scan-only   : the premask lax.scan alone (no BLAS traversal)
  v6  small       : v4 at 16k rays (did size matter?)

Usage: python tools/tpu_crash_bisect.py            # run the sweep
       python tools/tpu_crash_bisect.py --case v3  # one case, in-process
"""
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CASES = ["v1", "v2", "v3", "v4", "v5", "v6"]
# size threshold probes for the v4 construct (one bare traverse_wide):
# v4 crashes at 518400 rays, v6 passes at 16384 — sweep between
SIZE_CASES = {"s64k": 65536, "s128k": 131072, "s256k": 262144,
              "s32k": 32768, "s48k": 49152, "s24k": 24576}


def run_case(case: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rfw_tpu.ops import traverse
    from rfw_tpu.ops.intersect import BIG_T
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "tlas_ab", "/root/repo/tools/tlas_scale_ab.py")
    # reuse the AB tool's scene builder without executing its __main__
    src = open("/root/repo/tools/tlas_scale_ab.py").read()
    header = src.split('if "--subprocess-all"')[0]
    ns: dict = {"__name__": "tlas_ab_header", "__file__": spec.origin}
    exec(compile(header, spec.origin, "exec"), ns)

    eng = ns["build"](4)
    n_rays = SIZE_CASES.get(case, 518400 if case != "v6" else 16384)
    o, d = ns["rays"](n_rays)
    n = o.shape[0]
    tl = eng._scene["tlas"]
    blas = tl["blas"][0]
    wb = {"bmin": blas["bmin"], "bmax": blas["bmax"],
          "child": blas["child"], "count": blas["count"]}
    tris = (blas["v0"], blas["e1"], blas["e2"])
    lo_all, hi_all = blas["inst_bmin"], blas["inst_bmax"]
    inst_inv = blas["inst_inv"]
    n_inst = lo_all.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

    def premask_unchunked(cap):
        t1 = (lo_all[None] - o[:, None]) * inv_d[:, None]
        t2 = (hi_all[None] - o[:, None]) * inv_d[:, None]
        tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < cap[:, None])
        return (jnp.any(hit, axis=0),
                jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), BIG_T),
                        axis=0))

    def tlas_loop(use_cond: bool):
        def fn(o, d):
            best_t = jnp.full(n, BIG_T)
            best_p = jnp.full(n, -1, jnp.int32)
            cross, tn_min = premask_unchunked(best_t)
            order = jnp.argsort(jnp.where(cross, tn_min, jnp.inf),
                                stable=True).astype(jnp.int32)
            count = jnp.sum(cross.astype(jnp.int32))

            def body(state):
                k, bt, bp = state
                i = order[k]
                inv = inst_inv[i]

                def visit(c):
                    bt, bp = c
                    o_obj = o @ inv[:3, :3].T + inv[:3, 3]
                    d_obj = d @ inv[:3, :3].T
                    t_i, p_i, _, _ = traverse.traverse_wide(
                        o_obj, d_obj, wb, tris, leaf_size=4, t_max=bt,
                        t_epsilon=1e-5)
                    better = (p_i >= 0) & (t_i < bt)
                    return (jnp.where(better, t_i, bt),
                            jnp.where(better, p_i, bp))

                if use_cond:
                    bt, bp = jax.lax.cond(k >= -1, visit, lambda c: c,
                                          (bt, bp))
                else:
                    bt, bp = visit((bt, bp))
                return (k + 1, bt, bp)

            st = jax.lax.while_loop(lambda s: s[0] < count, body,
                                    (jnp.int32(0), best_t, best_p))
            return st[1], st[2]
        return fn

    if case == "v1":
        from rfw_tpu.render.intersectors import FACTORIES
        its = FACTORIES["tlas"](eng.config)
        fn = jax.jit(lambda o, d: its.closest(eng._scene, o, d)[:2])
    elif case == "v2":
        fn = jax.jit(tlas_loop(use_cond=True))
    elif case == "v3":
        fn = jax.jit(tlas_loop(use_cond=False))
    elif case in ("v4", "v6") or case in SIZE_CASES:
        fn = jax.jit(lambda o, d: traverse.traverse_wide(
            o, d, wb, tris, leaf_size=4, t_epsilon=1e-5)[:2])
    elif case == "v5":
        def premask_scan(o, d):
            pad = (-n) % 65536
            o_r = jnp.pad(o, ((0, pad), (0, 0))).reshape(-1, 65536, 3)
            iv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            iv_r = jnp.pad(iv, ((0, pad), (0, 0))).reshape(-1, 65536, 3)

            def sbody(acc, xs):
                oc, ic = xs
                t1 = (lo_all[None] - oc[:, None]) * ic[:, None]
                t2 = (hi_all[None] - oc[:, None]) * ic[:, None]
                tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
                tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
                hit = tf >= jnp.maximum(tn, 0.0)
                return (acc[0] | jnp.any(hit, axis=0),
                        jnp.minimum(acc[1], jnp.min(
                            jnp.where(hit, jnp.maximum(tn, 0.0), BIG_T),
                            axis=0))), None

            (cross, tn_min), _ = jax.lax.scan(
                sbody, (jnp.zeros(n_inst, bool),
                        jnp.full(n_inst, BIG_T)), (o_r, iv_r))
            return cross, tn_min
        fn = jax.jit(premask_scan)
    else:
        raise SystemExit(f"unknown case {case}")

    t0 = time.time()
    out = fn(o, d)
    np.asarray(out[0].ravel()[:1])      # force first execution
    print(f"CASE {case}: OK first-exec {time.time() - t0:.1f}s "
          f"on {jax.devices()[0].platform}", flush=True)


def main():
    if "--case" in sys.argv:
        run_case(sys.argv[sys.argv.index("--case") + 1])
        return
    cases = (["s32k", "s48k", "s24k"] if "--sizes2" in sys.argv
             else list(SIZE_CASES)[:3] if "--sizes" in sys.argv else CASES)
    results = {}
    for case in cases:
        print(f"--- {case} ---", flush=True)
        r = subprocess.run(
            [sys.executable, __file__, "--case", case],
            capture_output=True, text=True, timeout=2400)
        ok = r.returncode == 0 and "OK first-exec" in r.stdout
        results[case] = "OK" if ok else "CRASH/FAIL"
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        print(f"{case}: {results[case]}  | " + " | ".join(tail), flush=True)
        if not ok:
            time.sleep(60)    # give the worker time to recover
    print("\nsummary:", results)


if __name__ == "__main__":
    main()
