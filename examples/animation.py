"""BASELINE config 4: animated glTF skinning with per-frame BVH rebuild.

Renders CesiumMan walking; reports host update + render rates.

  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python examples/animation.py \
      --frames 8 --size 160 --spp 4
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rfw_tpu.app import App  # noqa: E402

CESIUM = "/root/reference/assets/models/CesiumMan/CesiumMan.gltf"


class AnimDemo(App):
    def __init__(self, frames: int, **kw):
        super().__init__(**kw)
        self.frames = frames
        self.update_times: list[float] = []

    def init(self, rs):
        ref = rs.add_object(CESIUM)
        rs.add_instance(ref)
        floor = rs.add_material([0.5, 0.5, 0.55])
        g = rs.add_quad([0, 1, 0], [0, 0, 0], 10, 10, floor)
        rs.add_instance(g)
        rs.add_directional_light([0.4, -1.0, 0.3], [2.5, 2.4, 2.2])
        from rfw_tpu.scene import Skybox
        rs.set_skybox(Skybox.test_sky(128, 64))
        verts = np.concatenate(
            [m.positions for m in ref.object.meshes])
        c = verts.mean(0)
        rs.camera.look_at(c + np.array([1.2, 0.6, 2.4]), c)

    def update(self, rs, dt):
        t0 = time.time()
        rs.set_animations_to(self.frame_index * (1.0 / 12.0))
        rs.synchronize()
        self.update_times.append(time.time() - t0)
        return self.frame_index < self.frames - 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--engine", default="megakernel")
    ap.add_argument("--out", default="anim_frames")
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    app = AnimDemo(frames=args.frames, width=args.size, height=args.size,
                   engine=args.engine, output_dir=args.out,
                   camera_file=os.path.join(args.out, "camera.bin"))
    t0 = time.time()
    app.run(frames=args.frames, samples_per_frame=args.spp)
    total = time.time() - t0
    upd = np.mean(app.update_times) if app.update_times else 0.0
    print(f"{args.frames} frames in {total:.1f}s "
          f"({args.frames / total:.2f} fps incl. compile); "
          f"scene update {upd * 1e3:.1f} ms/frame")


if __name__ == "__main__":
    main()
