"""Attribute the compacted driver's per-sample phases at 1080p with
forced syncs after every phase (the production step() overlaps phases;
the final depth otherwise drains unmeasured into finalize).

Usage: python tools/driver_tail.py [--legacy-atlas]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
import bench as benchmod  # noqa: E402

W, H = 1920, 1080
cfg = RenderConfig(
    merged_material_atlas="--legacy-atlas" not in sys.argv[1:])
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(W, H)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(W, H)
eng.update()
eng._get_trace_fn(W, H)
drv = eng._driver
assert drv is not None
scene = eng._scene
view = rs.camera.get_view().as_pytree()
chunk = drv.chunk
n = drv.n


def sync(x):
    np.asarray(jax.tree.flatten(x)[0][0].ravel()[:1])


def run_sample(sample_index, phases):
    def mark(name, out):
        sync(out)
        t = time.time()
        phases[name] = phases.get(name, 0.0) + (t - mark.t0)
        mark.t0 = t
    mark.t0 = time.time()
    state = drv._init(scene, view, jnp.uint32(sample_index))
    mark("init", state)
    live = n
    for depth in range(cfg.max_path_length + 1):
        n_chunks = max(1, -(-live // chunk))
        parts = []
        for c in range(n_chunks):
            sl = drv._slice(state, c)
            out, st, probe_c, aux_c = drv._stage(
                scene, view, sl, jnp.uint32(sample_index), jnp.int32(0),
                depth)
            parts.append(out)
        tail = jax.tree.map(lambda a: a[n_chunks * chunk:], state)
        state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts, tail)
        mark(f"d{depth} stage x{n_chunks}", state)
        if depth < cfg.max_path_length:
            # mirror step(): predicted-m apply dispatched before the
            # live sync (no pipeline bubble on the dispatch RTT)
            order, live_dev = drv._compact_keys(scene, state)
            m_pred = drv._m_pred.get(depth, n)
            new_state = drv._compact_apply(state, order, m=m_pred)
            live = int(live_dev)
            m = min(max(1, -(-live // chunk)) * chunk, n)
            drv._m_pred[depth] = m
            if m > m_pred:
                new_state = drv._compact_apply(state, order, m=m)
            state = new_state
            mark(f"d{depth} compact+sync", state)
    radiance = drv._finalize(state)
    mark("finalize", radiance)
    return phases


phases: dict = {}
run_sample(0, {})                 # compile + first m predictions
run_sample(1, {})                 # warm with stable m
t0 = time.time()
REPS = 3
for i in range(REPS):
    run_sample(i + 2, phases)
total = (time.time() - t0) / REPS
print(f"total {total * 1000:.0f} ms/sample "
      f"(merged_atlas={cfg.merged_material_atlas})", flush=True)
for k, v in phases.items():
    print(f"  {k}: {v / REPS * 1000:.1f} ms", flush=True)
