"""Sweep the visit intersector's knobs on the REAL depth-1 bounce stream:
M_C (visit cap per pass), BLOCK (rays per block), and the compaction
sort-key recipe (octant/Morton bit budget). Bounce closest is ~530 ms per
518k chunk vs 40 ms coherent — the dominant per-sample cost."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.ops import visit_intersect as vi  # noqa: E402
from rfw_tpu.ops.compaction import _morton3  # noqa: E402
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
import bench as benchmod  # noqa: E402

W, H = 1920, 1080
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(W, H)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(W, H)
eng.update()
scene = eng._scene
view = rs.camera.get_view().as_pytree()
inter = FACTORIES["visit"](cfg)

n = W * H
chunk = n // 4
drv = WavefrontDriver(W, H, cfg, inter, None, chunk)
state = drv._init(scene, view, jnp.uint32(0))
parts = []
for c in range(4):
    out, _, _, _ = drv._stage(scene, view, drv._slice(state, c),
                              jnp.uint32(0), jnp.int32(0), 0)
    parts.append(out)
state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)

# raw (unsorted) live-compacted stream for key-recipe experiments
alive_np = np.asarray(state.alive)
tl = scene["treelets"]
lo = np.asarray(tl["scene_lo"] if "scene_lo" in tl
                else tl["bmin"].min(axis=0))
hi = np.asarray(tl["scene_hi"] if "scene_hi" in tl
                else tl["bmax"].max(axis=0))


def sort_with(key_fn):
    o, d = state.origin, state.direction
    keys = key_fn(o, d)
    keys = keys + jnp.where(state.alive, jnp.uint32(0),
                            jnp.uint32(1) << 30)
    order = jnp.argsort(keys).astype(jnp.int32)
    st = jax.tree.map(lambda a: a[order], state)
    return jax.tree.map(lambda a: a[:chunk], st)


def key_octmorton(bits, dbits=0):
    def f(o, d):
        octant = ((d[:, 0] > 0).astype(jnp.uint32)
                  | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
        ext = jnp.maximum(jnp.asarray(hi - lo, jnp.float32), 1e-6)
        q = jnp.clip((o - jnp.asarray(lo, jnp.float32)) / ext, 0.0, 1.0)
        s = jnp.float32((1 << bits) - 1)
        qi = (q * s).astype(jnp.uint32)
        m = _morton3(qi[:, 0], qi[:, 1], qi[:, 2], bits)
        key = (octant << (3 * bits)) | m
        if dbits:
            # direction morton appended as the LOW bits (ties within an
            # origin cell break by direction)
            dq = jnp.clip(d * 0.5 + 0.5, 0.0, 1.0)
            ds = jnp.float32((1 << dbits) - 1)
            di = (dq * ds).astype(jnp.uint32)
            dm = _morton3(di[:, 0], di[:, 1], di[:, 2], dbits)
            key = (key << (3 * dbits)) | dm
        return key
    return f


def key_dirmajor(bits, dbits):
    def f(o, d):
        dq = jnp.clip(d * 0.5 + 0.5, 0.0, 1.0)
        ds = jnp.float32((1 << dbits) - 1)
        di = (dq * ds).astype(jnp.uint32)
        dm = _morton3(di[:, 0], di[:, 1], di[:, 2], dbits)
        ext = jnp.maximum(jnp.asarray(hi - lo, jnp.float32), 1e-6)
        q = jnp.clip((o - jnp.asarray(lo, jnp.float32)) / ext, 0.0, 1.0)
        s = jnp.float32((1 << bits) - 1)
        qi = (q * s).astype(jnp.uint32)
        m = _morton3(qi[:, 0], qi[:, 1], qi[:, 2], bits)
        return (dm << (3 * bits)) | m
    return f


def bench_closest(label, st, reps=3):
    f = jax.jit(lambda sc, o, d, tm: inter.closest(sc, o, d, tm,
                                                   sort=False))
    tm = jnp.where(st.alive, jnp.float32(1e30), 0.0)
    out = f(scene, st.origin, st.direction, tm)
    np.asarray(out[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = f(scene, st.origin, st.direction, tm)
    np.asarray(out[0].ravel()[:1])
    dt = (time.time() - t0) / reps * 1000
    print(f"{label}: {dt:.1f} ms", flush=True)
    return float(np.asarray(out[0]).sum())


# --- baseline: current recipe (octant | morton7) -----------------------
st_base = sort_with(key_octmorton(7))
ref = bench_closest("keys octant|m7 (current)", st_base)

for label, kf in [
    ("keys octant|m10", key_octmorton(10)),
    ("keys octant|m7|dir2", key_octmorton(7, 2)),
    ("keys octant|m5|dir3", key_octmorton(5, 3)),
    ("keys dir3-major|m7", key_dirmajor(7, 3)),
]:
    bench_closest(label, sort_with(kf))

# --- M_C sweep on the current recipe -----------------------------------
for m_c in (64, 256):
    vi.M_C = m_c
    bench_closest(f"M_C={m_c}", st_base)
vi.M_C = 128

# --- BLOCK sweep --------------------------------------------------------
for blk in (128, 512):
    vi.BLOCK = blk
    try:
        bench_closest(f"BLOCK={blk}", st_base)
    except Exception as e:  # noqa: BLE001
        print(f"BLOCK={blk}: FAILED {type(e).__name__}: {e}", flush=True)
vi.BLOCK = 256
