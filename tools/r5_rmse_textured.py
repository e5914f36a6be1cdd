"""On-chip accuracy evidence for a CONFIG-3-CLASS scene (VERDICT r4 #6):
TPU wavefront (flagship intersector) vs the CPU megakernel oracle on the
pica bench scene — textures via the merged material atlas + stochastic
filtering, microfacet materials, HDR-style procedural skybox with
importance sampling. Cornell (tools/rmse_check.py) never exercises
those paths; this does, at pica scale.

Writes .bench/rmse_textured.json + both images.

Usage: python tools/r5_rmse_textured.py [W H spp]   (default 320 180 16)
       RFW_RMSE_INTERSECTOR=tvisit to check the round-5 core instead
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

W = int(sys.argv[1]) if len(sys.argv) > 1 else 320
H = int(sys.argv[2]) if len(sys.argv) > 2 else 180
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16
inter = os.environ.get("RFW_RMSE_INTERSECTOR", "")

SCRIPT = """
import sys, time
sys.path.insert(0, "/root/repo")
{cpu}
import numpy as np
from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
import bench as benchmod
rs = RenderSystem("{engine}", RenderConfig())
benchmod.build_scene(rs)
rs.camera.resize({w}, {h})
rs.camera.fov = 60.0
rs.synchronize()
{setting}
t0 = time.time()
img = rs.render_frame(samples={spp})
print(f"{engine} {spp}spp {w}x{h}: {{time.time()-t0:.0f}}s", flush=True)
np.save("{out}", np.asarray(img))
"""

os.makedirs("/root/repo/.bench", exist_ok=True)
tpu_out = "/root/repo/.bench/pica_tpu.npy"
cpu_out = "/root/repo/.bench/pica_cpu.npy"

setting = (f'rs.context.set_setting("intersector", "{inter}")'
           if inter else "")
# TPU render in THIS process (holds the chip claim once)
exec(SCRIPT.format(cpu="", engine="wavefront", w=W, h=H, spp=spp,
                   out=tpu_out, setting=setting))

# CPU oracle in a subprocess (axon platform can't switch mid-process)
r = subprocess.run(
    [sys.executable, "-c", SCRIPT.format(
        cpu='import jax; jax.config.update("jax_platforms", "cpu")',
        engine="megakernel", w=W, h=H, spp=spp, out=cpu_out, setting="")],
    timeout=14000, text=True, capture_output=True)
print(r.stdout.strip() or r.stderr.strip().splitlines()[-1:], flush=True)

a = np.load(tpu_out)
b = np.load(cpu_out)
rmse = float(np.sqrt(np.mean((a - b) ** 2)))
rel = rmse / max(float(np.sqrt(np.mean(b ** 2))), 1e-9)
out = {"scene": "pica-4x (textured+matlas+stochastic+env IS)",
       "size": [W, H], "spp": spp,
       "intersector": inter or "default(visit)",
       "rmse": rmse, "rel_rmse": rel,
       "tpu_mean": float(a.mean()), "cpu_mean": float(b.mean())}
with open("/root/repo/.bench/rmse_textured.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
