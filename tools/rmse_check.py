"""Accuracy evidence: TPU wavefront vs CPU megakernel oracle, Cornell 512spp.

The BASELINE criterion is <1% RMSE vs the CPU reference (the role Embree
plays in the reference project; here the bit-exact megakernel oracle).
Writes .bench/rmse.json + the two images.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np

size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 512

from test_integrator import make_cornell
from rfw_tpu.render import RenderStatus

# TPU wavefront
rs = make_cornell("wavefront", size=size)
t0 = time.time()
img_tpu = rs.render_frame(samples=spp)
print(f"TPU wavefront {spp}spp: {time.time()-t0:.0f}s "
      f"({spp/(time.time()-t0):.2f} spp/s)", flush=True)
np.save("/root/repo/.bench/cornell_tpu_hi.npy", img_tpu)
print("tpu mean:", float(img_tpu.mean()), flush=True)

# CPU oracle + RMSE in a SUBPROCESS (the axon platform can't be switched
# to cpu mid-process): set SKIP_CPU=1 to skip.
if not os.environ.get("SKIP_CPU"):
    import subprocess
    code = f"""
import sys, time, json
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from test_integrator import make_cornell
rs = make_cornell("megakernel", size={size})
t0 = time.time()
img = rs.render_frame(samples={spp})
print(f"CPU megakernel {spp}spp: {{time.time()-t0:.0f}}s", flush=True)
np.save("/root/repo/.bench/cornell_cpu_hi.npy", img)
tpu = np.load("/root/repo/.bench/cornell_tpu_hi.npy")
rmse = float(np.sqrt(np.mean((img - tpu) ** 2)))
rel = rmse / float(img.mean())
print(f"RMSE {{rmse:.6f}}  relative {{rel*100:.3f}}% (criterion < 1%)",
      flush=True)
json.dump({{"rmse": rmse, "relative_pct": rel * 100}},
          open("/root/repo/.bench/rmse.json", "w"))
"""
    subprocess.run([sys.executable, "-c", code], check=True)
