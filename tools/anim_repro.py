import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_log_compiles', True)
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, visit_intersect as pi
from rfw_tpu.render import RenderStatus

rs = RenderSystem("wavefront", RenderConfig())
ref = rs.add_object("/root/reference/assets/models/CesiumMan/CesiumMan.gltf")
rs.add_instance(ref)
floor = rs.add_material([0.5,0.5,0.55])
g = rs.add_quad([0,1,0],[0,0,0],10,10,floor); rs.add_instance(g)
rs.add_directional_light([0.4,-1.0,0.3],[2.5,2.4,2.2])
from rfw_tpu.scene import Skybox
rs.set_skybox(Skybox.test_sky(128, 64))
v = np.concatenate([m.positions for m in ref.object.meshes]); c = v.mean(0)
rs.camera.resize(256,256); rs.camera.look_at(c+np.array([1.2,0.6,2.4]), c)
rs.synchronize(); eng = rs.context; eng.resize(256,256); eng.update()
scene = eng._scene
tl = scene["treelets"]
print("treelets:", tl["bmin"].shape[0], "tris:", scene["tri_vertices"].shape[0], flush=True)

view = rs.camera.get_view().as_pytree()
O, D = raygen.generate_primary_rays(view, 256, 256, 0)
O = jnp.asarray(np.asarray(O)); D = jnp.asarray(np.asarray(D))
cfg = RenderConfig()
ch = jax.jit(lambda o, d: pi.closest_hit(scene, o, d, cfg))
t, prim, u, vv = ch(O, D); t.block_until_ready()
t0=time.time()
for _ in range(3): t, prim, u, vv = ch(O, D)
t.block_until_ready()
print(f"closest: {(time.time()-t0)/3*1000:.0f} ms, hitrate {float((np.asarray(prim)>=0).mean()):.2f}", flush=True)

t0=time.time(); rs.render_frame(status=RenderStatus.RESET, samples=1)
print(f"full sample (post-compile? includes compile on first): {time.time()-t0:.1f}s", flush=True)
t0=time.time(); rs.render_frame(status=RenderStatus.CONVERGE, samples=1)
print(f"full sample steady: {time.time()-t0:.1f}s", flush=True)

for i in range(3):
    t0=time.time()
    rs.set_animations_to(0.3 + 0.2*i)
    t1=time.time()
    rs.synchronize()
    t2=time.time()
    rs.render_frame(status=RenderStatus.RESET, samples=1)
    t3=time.time()
    print(f"anim frame: set_time {t1-t0:.2f}s sync {t2-t1:.2f}s render {t3-t2:.2f}s", flush=True)

# identity check: is the engine's cached step being dropped?
fn_before = eng._trace_fn
rs.set_animations_to(0.9)
rs.synchronize()
fn_after = eng._trace_fn
print("trace_fn survived:", fn_before is fn_after, flush=True)
if fn_before is not fn_after:
    import jax as jx
    def shp(t):
        return jx.tree.map(lambda x: (getattr(x, "shape", None),
                                      str(getattr(x, "dtype", ""))), t)
    print("scene keys:", sorted(eng._scene.keys()), flush=True)
