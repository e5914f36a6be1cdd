"""Alpha cutout: transparent texels pass rays through (Kernels.cu:636-648)."""

import numpy as np

from rfw_tpu.config import RenderConfig
from rfw_tpu.render import RenderStatus, create_engine
from rfw_tpu.scene import HostMaterial, MaterialList, Texture, make_quad
from rfw_tpu.scene.texture import build_texture_atlas
import rfw_tpu


def _engine_with_alpha_quad():
    ml = MaterialList()
    # texture: left half transparent, right half opaque white
    tex = np.ones((8, 8, 4), np.float32)
    tex[:, :4, 3] = 0.0
    tid = ml.add_texture(Texture.from_array(tex))
    holed = HostMaterial(name="holed", roughness=1.0, alpha_cutout=True)
    holed.maps[0].texture_id = tid
    m_holed = ml.add(holed)
    m_back = ml.add(HostMaterial(color=np.array([5.0, 1.2, 1.2])))  # emissive

    eng = create_engine("megakernel", RenderConfig(
        blue_noise=False, max_path_length=2, variance_reduction=False,
        russian_roulette=False))
    front = make_quad([0, 0, -1], [0, 0, 0], 4, 4, m_holed)
    back = make_quad([0, 0, -1], [0, 0, 2], 4, 4, m_back)
    eng.set_mesh(0, front.triangles())
    eng.set_mesh(1, back.triangles())
    eng.set_instance(0, 0, np.eye(4, dtype=np.float32))
    eng.set_instance(1, 1, np.eye(4, dtype=np.float32))
    eng.set_materials(ml.generate_device_materials())
    eng.set_textures(build_texture_atlas(ml.textures))
    return eng


def test_alpha_cutout_passes_through():
    eng = _engine_with_alpha_quad()
    cam = rfw_tpu.Camera()
    cam.resize(32, 32)
    cam.fov = 50
    cam.look_at([0, 0, -4.0], [0, 0, 0])
    eng.resize(32, 32)
    img = eng.render_frame(cam.get_view().as_pytree(), RenderStatus.RESET,
                           samples=4)
    # camera right = -x: pixel-left is world +x (opaque... texture u grows
    # with world-x per quad uv). Just assert: one half sees the emissive
    # back wall (red, > 1), the other half sees black (opaque white quad,
    # unlit scene → 0 radiance).
    left = img[8:24, 2:14].mean(axis=(0, 1))
    right = img[8:24, 18:30].mean(axis=(0, 1))
    bright, dark = (left, right) if left[0] > right[0] else (right, left)
    assert bright[0] > 2.0          # emissive back visible through the hole
    assert dark.max() < 0.05        # opaque half blocks (unlit front quad)


def test_alpha_disabled_blocks():
    eng = _engine_with_alpha_quad()
    # same scene but cutout flag off → fully opaque
    mats = eng._materials
    mats["alpha_cutout"] = np.zeros_like(mats["alpha_cutout"])
    cam = rfw_tpu.Camera()
    cam.resize(16, 16)
    cam.look_at([0, 0, -4.0], [0, 0, 0])
    eng.resize(16, 16)
    img = eng.render_frame(cam.get_view().as_pytree(), RenderStatus.RESET,
                           samples=2)
    assert img.max() < 0.05
