"""Time the PRODUCTION one-jit driver step at 1080p (bench scene) plus a
raygen (init) attribution. driver_tail.py measures the host-loop building
blocks; this measures what bench.py actually runs per sample.

Usage: python tools/step_time.py [reps]
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

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
W, H = 1920, 1080
rs = RenderSystem("wavefront", RenderConfig())
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


def sync(x):
    np.asarray(jax.tree.flatten(x)[0][0].ravel()[:1])


# -- production step --------------------------------------------------------
acc = jnp.zeros((drv.n, 3), jnp.float32)
out = drv.step(scene, acc, view, 0, 0)
sync(out)
acc = out[0]
t0 = time.time()
for i in range(1, reps + 1):
    out = drv.step(scene, out[0], view, i, 0)
sync(out)
dt = (time.time() - t0) / reps * 1000
print(f"production step: {dt:.1f} ms/sample ({reps} reps)", flush=True)

# -- raygen attribution ------------------------------------------------------
full = jax.jit(drv._init)
o = full(scene, view, jnp.uint32(0))
sync(o)
t0 = time.time()
for i in range(reps):
    o = full(scene, view, jnp.uint32(i))
sync(o)
print(f"init (raygen+state): {(time.time()-t0)/reps*1000:.1f} ms",
      flush=True)

from rfw_tpu.ops import raygen  # noqa: E402

pid = drv._pid_dev
bn = scene.get("blue_noise")


@jax.jit
def rays_only(scene, view, si):
    return raygen.generate_primary_rays(
        view, W, H, si, blue_noise_mask=scene.get("blue_noise"),
        pixel_ids=pid)


o = rays_only(scene, view, jnp.uint32(0))
sync(o)
t0 = time.time()
for i in range(reps):
    o = rays_only(scene, view, jnp.uint32(i))
sync(o)
print(f"  raygen only: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)

if bn is not None and bn.ndim == 3:
    from rfw_tpu.ops import rng as rngmod

    @jax.jit
    def bn_row(scene, si):
        sx = (pid % jnp.uint32(W)).astype(jnp.int32)
        sy = (pid // jnp.uint32(W)).astype(jnp.int32)
        return rngmod.blue_noise_shift_row(scene["blue_noise"], sx, sy)

    o = bn_row(scene, jnp.uint32(0))
    sync(o)
    t0 = time.time()
    for i in range(reps):
        o = bn_row(scene, jnp.uint32(i))
    sync(o)
    print(f"  blue-noise shift row gather: "
          f"{(time.time()-t0)/reps*1000:.1f} ms", flush=True)
