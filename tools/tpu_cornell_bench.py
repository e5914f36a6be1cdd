"""End-to-end wavefront-engine bench on TPU: Cornell 512x512.

BASELINE config 1 (Cornell-box, 512^2, 1 spp) and config 2 shape
(full PT with NEE+MIS, accumulation).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    engine = sys.argv[3] if len(sys.argv) > 3 else "wavefront"

    from test_integrator import make_cornell
    from rfw_tpu.render import RenderStatus

    rs = make_cornell(engine, size=size)
    print("engine:", type(rs.context).__name__,
          "intersector:", rs.context._intersector_name, flush=True)

    t0 = time.time()
    rs.render_frame(samples=1)
    print(f"first sample (compile): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    frame = rs.render_frame(status=RenderStatus.CONVERGE, samples=spp)
    dt = time.time() - t0
    stats = rs.get_render_stats()
    rays = (stats.primary_count + stats.secondary_count + stats.deep_count
            + stats.shadow_count) * spp
    print(f"{spp} spp in {dt:.2f}s -> {rays / dt / 1e6:.1f} Mrays/s, "
          f"{spp / dt:.2f} spp/s @ {size}x{size}", flush=True)
    print("frame mean:", float(frame.mean()), flush=True)
    from rfw_tpu.utils import image
    from rfw_tpu.ops import tonemap
    import jax.numpy as jnp
    image.save_png("/root/repo/.bench/cornell_tpu.png",
                   np.asarray(tonemap.tonemap(jnp.asarray(frame))))


if __name__ == "__main__":
    main()
