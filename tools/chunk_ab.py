"""A/B the wavefront chunk size at 1080p with the VISIT intersector.

The 512k chunk (config.max_rays_per_pass = 1<<19) was tuned for the old
pairs driver whose combine sorts scaled super-linearly. The visit driver
replaced those with per-block row sorts (linear) — bigger chunks may now
win by cutting per-chunk fixed costs (launch overhead, state concat,
4x enumeration of the same candidate tables).

Usage: python tools/chunk_ab.py [n_chunks ...]   (default: 4 2 1)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rfw_tpu.system import RenderSystem  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render.wavefront_driver import WavefrontDriver  # noqa: E402
from rfw_tpu.render.intersectors import FACTORIES  # noqa: E402
import bench as benchmod  # noqa: E402

chunk_counts = [int(a) for a in sys.argv[1:]] or [4, 2, 1]
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
tex_flags = eng._tex_flags if hasattr(eng, "_tex_flags") else None
n = W * H


def run_sample(drv, chunk, sample_index):
    state = drv._init(scene, view, jnp.uint32(sample_index))
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
        if depth < cfg.max_path_length:
            state, live_dev = drv._compact(scene, state)
            live = int(live_dev)
    return drv._finalize(state)


for nc in chunk_counts:
    assert n % nc == 0, (n, nc)
    chunk = n // nc
    drv = WavefrontDriver(W, H, cfg, inter, None, chunk)
    t0 = time.time()
    out = run_sample(drv, chunk, 0)   # compile
    np.asarray(out.ravel()[:1])
    compile_s = time.time() - t0
    t0 = time.time()
    REPS = 3
    for i in range(REPS):
        out = run_sample(drv, chunk, i + 1)
    np.asarray(out.ravel()[:1])
    dt = (time.time() - t0) / REPS * 1000
    print(f"{nc} chunks ({chunk} rays): {dt:.0f} ms/sample "
          f"(compile {compile_s:.0f}s)", flush=True)
