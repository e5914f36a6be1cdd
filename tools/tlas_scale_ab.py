"""TLAS instance-count scaling (VERDICT r3 #7): is the O(instances)
slab-test scan + lax.cond traversal skip good enough, or does the 'tlas'
intersector need a BVH over instance AABBs (reference
top_level_bvh.cpp:55-102)?

Builds ONE shared 2k-tri mesh instanced on a sqrt(I) x sqrt(I) grid,
fires 518k camera rays at the middle of the grid (so most instances are
off-ray and the cond skip engages), and times closest-hit at instance
counts 4 / 32 / 128 / 512. The per-instance overhead = slope of time vs
count for SKIPPED instances; the reference's instance BVH would remove
exactly that slope.

Usage: python tools/tlas_scale_ab.py [--cpu]    (chip, or CPU via --cpu)
(--cpu uses the in-process platform switch — the JAX_PLATFORMS env var
is overridden by the axon sitecustomize, STATUS.md operational notes)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

import rfw_tpu  # noqa: E402
from rfw_tpu.config import RenderConfig  # noqa: E402
from rfw_tpu.render import create_engine  # noqa: E402
from rfw_tpu.scene import HostMaterial, MaterialList  # noqa: E402
from rfw_tpu.scene.mesh import TriangleSoA  # noqa: E402
from rfw_tpu.ops import raygen  # noqa: E402


def make_blob(n_tri=2048, seed=0):
    """A unit-radius triangle blob (random fan around a sphere)."""
    r = np.random.default_rng(seed)
    c = r.normal(size=(n_tri, 3)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    e1 = r.normal(size=(n_tri, 3)).astype(np.float32) * 0.08
    e2 = r.normal(size=(n_tri, 3)).astype(np.float32) * 0.08
    v0, v1, v2 = c, c + e1, c + e2
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    z = np.zeros((n_tri, 3), np.float32)
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    return TriangleSoA(
        vertices=np.stack([v0, v1, v2], axis=1),
        normals=np.stack([n, n, n], axis=1).astype(np.float32),
        gnormal=n.astype(np.float32),
        uv=np.zeros((n_tri, 3, 2), np.float32),
        tangent=z.copy(),
        bitangent=z.copy(),
        material=np.zeros(n_tri, np.int32),
        area=area.astype(np.float32),
        lod=np.zeros(n_tri, np.float32),
        light_tri_idx=np.full(n_tri, -1, np.int32))


def build(n_inst):
    cfg = RenderConfig(use_tlas=True, blue_noise=False)
    eng = create_engine("megakernel", cfg)
    ml = MaterialList()
    ml.add(HostMaterial(color=np.array([0.7, 0.6, 0.5]), roughness=1.0))
    eng.set_materials(ml.generate_device_materials())
    from rfw_tpu.scene.lights import PointLight, pack_lights
    eng.set_lights(pack_lights(
        [], [PointLight(position=np.array([0, 30, 0], np.float32),
                        radiance=np.array([900., 900., 900.],
                                          np.float32))], [], []))
    eng.set_mesh(0, make_blob())
    side = int(np.ceil(np.sqrt(n_inst)))
    for i in range(n_inst):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = (i % side - side / 2) * 3.0
        m[2, 3] = (i // side - side / 2) * 3.0
        eng.set_instance(i, 0, m)
    eng.set_setting("intersector", "tlas")
    eng.resize(16, 16)
    eng.update()
    return eng


def rays(n=518400):
    cam = rfw_tpu.Camera()
    w, h = 960, 540
    cam.resize(w, h)
    cam.fov = 35.0                       # narrow: looks at the middle blob
    cam.look_at([0.0, 1.5, -6.0], [0.0, 0.0, 0.0])
    o, d = raygen.generate_primary_rays(cam.get_view().as_pytree(),
                                        w, h, 0)
    if n < o.shape[0]:                   # --rays=: every nth pixel, keeps
        step = o.shape[0] // n           # the frame-wide direction spread
        o, d = o[::step][:n], d[::step][:n]
    return jnp.asarray(o), jnp.asarray(d)


if "--subprocess-all" in sys.argv:
    # one SUBPROCESS per instance count: a TPU-worker crash on one
    # config (observed twice at I=32 on the axon pool) doesn't kill the
    # sweep; each claim is fresh
    import subprocess
    for n_inst in (4, 32, 128, 512):
        r = subprocess.run(
            [sys.executable, __file__, f"--only={n_inst}"]
            + (["--cpu"] if "--cpu" in sys.argv else []),
            capture_output=True, text=True, timeout=2400)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("I=")]
        print(line[0] if line else
              f"I={n_inst:4d}  FAILED: {r.stderr.strip().splitlines()[-1:] }",
              flush=True)
    sys.exit(0)

only = [int(a.split("=")[1]) for a in sys.argv if a.startswith("--only=")]
n_rays = next((int(a.split("=")[1]) for a in sys.argv
               if a.startswith("--rays=")), 518400)

o, d = rays(n_rays)
for n_inst in (only or (4, 32, 128, 512)):
    eng = build(n_inst)
    its = eng._make_intersector() if hasattr(eng, "_make_intersector") \
        else None
    from rfw_tpu.render.intersectors import FACTORIES
    its = FACTORIES["tlas"](eng.config)
    fn = jax.jit(lambda s, o, d: its.closest(s, o, d))
    out = fn(eng._scene, o, d)
    np.asarray(out[0].ravel()[:1])
    t0 = time.time()
    for _ in range(3):
        out = fn(eng._scene, o, d)
    np.asarray(out[0].ravel()[:1])
    dt = (time.time() - t0) / 3 * 1000
    hits = int((np.asarray(out[1]) >= 0).sum())
    print(f"I={n_inst:4d}  closest {n_rays // 1000}k rays: {dt:8.1f} ms"
          f"   hits {hits}", flush=True)
