"""Follow-up: legal 32-bit sort-key recipes for bounce-stream compaction.
m10|octant won 2.6x in visit_sweep but overflowed u32 (octant truncated).
Candidates here all fit: dead(1) stays at bit 31."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
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

tl = scene["treelets"]
lo = jnp.asarray(tl["scene_lo"] if "scene_lo" in tl
                 else tl["bmin"].min(axis=0), jnp.float32)
hi = jnp.asarray(tl["scene_hi"] if "scene_hi" in tl
                 else tl["bmax"].max(axis=0), jnp.float32)


def morton(o, bits):
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / ext, 0.0, 1.0)
    s = jnp.float32((1 << bits) - 1)
    qi = (q * s).astype(jnp.uint32)
    return _morton3(qi[:, 0], qi[:, 1], qi[:, 2], bits)


def octant(d):
    return ((d[:, 0] > 0).astype(jnp.uint32)
            | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
            | ((d[:, 2] > 0).astype(jnp.uint32) << 2))


RECIPES = {
    "oct3|m9  (30b)": lambda o, d: (octant(d) << 27) | morton(o, 9),
    "m10      (30b)": lambda o, d: morton(o, 10),
    "m10|oct-trunc": lambda o, d: ((octant(d) << 30) | morton(o, 10)),
    "oct1x|m9 (28b)": lambda o, d: (
        ((d[:, 0] > 0).astype(jnp.uint32) << 27) | morton(o, 9)),
}


def sort_with(key_fn):
    keys = key_fn(state.origin, state.direction)
    keys = jnp.where(state.alive, keys, keys | jnp.uint32(1) << 31)
    order = jnp.argsort(keys).astype(jnp.int32)
    st = jax.tree.map(lambda a: a[order], state)
    return jax.tree.map(lambda a: a[:chunk], st)


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
    print(f"{label}: {(time.time() - t0) / reps * 1000:.1f} ms", flush=True)


for label, kf in RECIPES.items():
    bench_closest(label, sort_with(kf))
