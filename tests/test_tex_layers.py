"""Additive texture layers (reference 11-slot map surface,
getShadingData.h:162-206): 2nd diffuse layer adds its texel to the
modulated base; 2nd normal layer perturbs the shading normal."""

import numpy as np

import rfw_tpu
from rfw_tpu.config import RenderConfig
from rfw_tpu.render import RenderStatus, create_engine
from rfw_tpu.scene import HostMaterial, MaterialList, Texture, make_quad
from rfw_tpu.scene.lights import PointLight, pack_lights
from rfw_tpu.scene.materials import TEX_DIFFUSE, TEX_DIFFUSE1, TEX_NORMAL1
from rfw_tpu.scene.texture import build_atlases_cached


def _render(with_layer: bool):
    cfg = RenderConfig(blue_noise=False, max_path_length=0,
                       texture_filter="nearest", variance_reduction=True,
                       envmap_nee=False)
    eng = create_engine("megakernel", cfg)
    ml = MaterialList()
    base = Texture.from_array(np.full((8, 8, 4), 0.5, np.float32))
    layer = Texture.from_array(np.full((8, 8, 4), 0.25, np.float32))
    t_base = ml.add_texture(base)
    t_layer = ml.add_texture(layer)
    m = HostMaterial(name="layered", color=np.ones(3, np.float32),
                     roughness=1.0)
    m.maps[TEX_DIFFUSE].texture_id = t_base
    if with_layer:
        m.maps[TEX_DIFFUSE1].texture_id = t_layer
    ml.add(m)
    md = ml.generate_device_materials()
    atlas, mtex_id = build_atlases_cached(ml.materials, ml.textures, True)
    if with_layer:
        assert "matlas" not in atlas   # layers force the flat-atlas path
    if mtex_id is not None:
        md["mtex_id"] = mtex_id
    eng.set_materials(md)
    eng.set_textures(atlas)
    eng.set_lights(pack_lights(
        [], [PointLight(position=np.array([0, 4.0, 0], np.float32),
                        radiance=np.array([50.0] * 3, np.float32))],
        [], []))
    eng.set_mesh(0, make_quad([0, 1, 0], [0, 0, 0], 8, 8, 0).triangles())
    eng.set_instance(0, 0, np.eye(4, dtype=np.float32))
    cam = rfw_tpu.Camera()
    cam.resize(32, 32)
    cam.look_at([0, 3.0, -3.0], [0, 0, 0])
    eng.resize(32, 32)
    return np.asarray(eng.render_frame(cam.get_view().as_pytree(),
                                       RenderStatus.RESET, samples=4))


def test_second_diffuse_layer_adds():
    plain = _render(False)
    layered = _render(True)
    c = plain[16, 16].mean()
    cl = layered[16, 16].mean()
    assert c > 1e-4
    # base texel 0.5 → color 0.5; +layer 0.25 → 0.75: ratio 1.5
    assert abs(cl / c - 1.5) < 0.05, (c, cl)
