"""BASELINE config 3: microfacet BSDF + textured materials + HDR envmap
importance sampling.

  PYTHONPATH=/root/repo python examples/textured_env.py --cpu --size 192
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="textured_env.png")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--engine", default="megakernel")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from rfw_tpu.config import RenderConfig
    from rfw_tpu.scene import Skybox, Texture
    from rfw_tpu.system import RenderSystem
    from rfw_tpu.utils import image

    rs = RenderSystem(args.engine, RenderConfig(bsdf="microfacet"))

    # checkerboard floor texture
    checker = (np.indices((64, 64)).sum(0) // 8) % 2
    tex = np.stack([checker * 0.75 + 0.15] * 3
                   + [np.ones((64, 64))], -1).astype(np.float32)
    tid = rs.materials.add_texture(Texture.from_array(tex))
    floor = rs.add_material([1, 1, 1], roughness=0.6)
    rs.get_material(floor).maps[0].texture_id = tid

    rough_metal = rs.add_material([0.9, 0.75, 0.4], roughness=0.25,
                                  metallic=1.0)
    shiny = rs.add_material([0.9, 0.9, 0.95], roughness=0.05, metallic=1.0)

    g = rs.add_quad([0, 1, 0], [0, 0, 0], 12, 12, floor)
    rs.add_instance(g)
    s1 = rs.add_object("/root/reference/assets/models/sphere.obj",
                       material_override=rough_metal, normalize=True)
    rs.add_instance(s1, scale=(2, 2, 2), translation=(-1.4, 1.0, 0))
    s2 = rs.add_object("/root/reference/assets/models/sphere.obj",
                       material_override=shiny, normalize=True)
    rs.add_instance(s2, scale=(2, 2, 2), translation=(1.4, 1.0, 0))

    # HDR envmap with a strong sun → exercises importance sampling
    rs.set_skybox(Skybox.test_sky(256, 128))

    rs.camera.resize(args.size, args.size)
    rs.camera.fov = 45
    rs.camera.look_at([0, 2.2, -6.0], [0, 1.0, 0])
    img = rs.render_tonemapped(samples=args.spp)
    image.save_png(args.out, img)
    stats = rs.get_render_stats()
    print(f"{args.size}x{args.size}@{args.spp}spp "
          f"({stats.mrays_per_s():.2f} Mrays/s last batch) -> {args.out}")


if __name__ == "__main__":
    main()
