"""Scene loader tests against the bundled reference assets (read-only data)."""

import os

import numpy as np
import pytest

from rfw_tpu.scene import MaterialList, load_object, make_quad


def test_quad_winding():
    q = make_quad([0, -1, 0], [0, 5, 0], 2.0, 2.0, material_id=3)
    tris = q.triangles()
    assert tris.count == 2
    assert np.allclose(tris.gnormal, [[0, -1, 0], [0, -1, 0]], atol=1e-6)
    assert np.allclose(tris.area.sum(), 4.0, atol=1e-5)
    assert (tris.material == 3).all()


@pytest.mark.parametrize("rel", ["models/CesiumMan/CesiumMan.gltf"])
def test_gltf_skinned(assets_dir, rel):
    path = os.path.join(assets_dir, rel)
    if not os.path.exists(path):
        pytest.skip("asset missing")
    ml = MaterialList()
    obj = load_object(path, ml)
    assert len(obj.meshes) == 1
    assert obj.meshes[0].skin_id == 0
    assert len(obj.animations) == 1
    base = obj.meshes[0].positions.copy()
    obj.set_time(0.5)
    assert np.abs(obj.meshes[0].positions - base).max() > 1e-3
    # rest pose ≈ base vertices at t=0 of the animation need not hold (anim
    # starts posed), but geometry must stay finite and triangles valid
    tris = obj.meshes[0].triangles()
    assert np.isfinite(tris.vertices).all()
    assert tris.area.sum() > 0


def test_gltf_morph_targets(assets_dir):
    path = os.path.join(assets_dir, "models/AnimatedMorphCube.glb")
    if not os.path.exists(path):
        pytest.skip("asset missing")
    ml = MaterialList()
    obj = load_object(path, ml)
    mesh = obj.meshes[0]
    assert mesh.morph_positions is not None
    obj.set_time(1.2)
    p1 = mesh.positions.copy()
    obj.set_time(2.4)
    assert np.abs(mesh.positions - p1).max() > 1e-5


def test_obj_loader(assets_dir):
    path = os.path.join(assets_dir, "models/sphere.obj")
    if not os.path.exists(path):
        pytest.skip("asset missing")
    ml = MaterialList()
    obj = load_object(path, ml)
    tris = obj.meshes[0].triangles()
    assert tris.count > 100
    # sphere.obj is a unit-ish sphere: all vertices near-equidistant
    r = np.linalg.norm(tris.vertices.reshape(-1, 3), axis=-1)
    assert r.std() / r.mean() < 0.05
    # smooth normals roughly parallel to position direction on a sphere
    v = tris.vertices.reshape(-1, 3)
    n = tris.normals.reshape(-1, 3)
    cosang = (v * n).sum(-1) / np.maximum(np.linalg.norm(v, axis=-1), 1e-9)
    assert np.median(np.abs(cosang)) > 0.9


def test_material_emissive_packing():
    from rfw_tpu.scene import HostMaterial
    ml = MaterialList()
    ml.add(HostMaterial(color=np.array([0.5, 0.5, 0.5])))
    ml.add(HostMaterial(color=np.array([10.0, 10.0, 10.0])))
    dev = ml.generate_device_materials()
    assert not bool(dev["emissive"][0])
    assert bool(dev["emissive"][1])
    assert dev["color"].shape == (2, 3)
    assert dev["roughness"].dtype == np.float32


def test_ply_roundtrip(tmp_path):
    """Write ascii + binary PLY, load both, expect identical geometry."""
    import struct
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    faces = [(0, 1, 2, 3)]  # quad -> 2 fan triangles

    ascii_ply = tmp_path / "quad_ascii.ply"
    ascii_ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        + "".join(f"{x} {y} {z}\n" for x, y, z in verts)
        + "4 0 1 2 3\n")

    bin_ply = tmp_path / "quad_bin.ply"
    header = (b"ply\nformat binary_little_endian 1.0\nelement vertex 4\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 1\nproperty list uchar int vertex_indices\n"
              b"end_header\n")
    body = b"".join(struct.pack("<3f", *v) for v in verts)
    body += struct.pack("<B4i", 4, *faces[0])
    bin_ply.write_bytes(header + body)

    from rfw_tpu.scene import MaterialList, load_object
    a = load_object(str(ascii_ply), MaterialList())
    b = load_object(str(bin_ply), MaterialList())
    ta, tb = a.meshes[0].triangles(), b.meshes[0].triangles()
    assert ta.count == tb.count == 2
    assert np.allclose(ta.vertices, tb.vertices)
    assert np.allclose(ta.area.sum(), 1.0, atol=1e-6)


@pytest.mark.parametrize("rel,min_tris", [
    ("models/dragon.obj", 10000),
    ("models/legocar.obj", 1000),
    ("models/lpshead/head.OBJ", 5000),   # uppercase extension dispatch
    ("models/pica/scene.gltf", 50000),   # external .bin + texture refs
])
def test_obj_breadth(assets_dir, rel, min_tris):
    """Larger OBJ assets load with sane geometry."""
    path = os.path.join(assets_dir, rel)
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        pytest.skip("asset missing or empty (git-lfs pointer)")
    ml = MaterialList()
    obj = load_object(path, ml)
    total = sum(m.triangle_count for m in obj.meshes)
    assert total >= min_tris
    for m in obj.meshes:
        tris = m.triangles()
        assert np.isfinite(tris.vertices).all()
        assert (tris.area >= 0).all()


def test_glb_interpolation_asset(assets_dir):
    """GLB with STEP/LINEAR/CUBICSPLINE channels loads and animates."""
    path = os.path.join(assets_dir, "models/InterpolationTest.glb")
    if not os.path.exists(path):
        pytest.skip("asset missing")
    ml = MaterialList()
    obj = load_object(path, ml)
    assert obj.animations
    obj.set_time(0.5)
    obj.set_time(1.5)
    for m in obj.meshes:
        assert np.isfinite(m.positions).all()


def test_stl_roundtrip(tmp_path):
    """Binary + ASCII STL of the same two triangles load identically."""
    import struct
    tris = np.array([[[0, 0, 0], [1, 0, 0], [1, 1, 0]],
                     [[0, 0, 0], [1, 1, 0], [0, 1, 0]]], np.float32)

    a = tmp_path / "quad_ascii.stl"
    lines = ["solid quad"]
    for t in tris:
        lines += ["facet normal 0 0 1", "outer loop"]
        lines += [f"vertex {v[0]} {v[1]} {v[2]}" for v in t]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid quad")
    a.write_text("\n".join(lines))

    b = tmp_path / "quad_bin.stl"
    body = b"\x00" * 80 + struct.pack("<I", len(tris))
    for t in tris:
        body += struct.pack("<3f", 0, 0, 1)
        for v in t:
            body += struct.pack("<3f", *v)
        body += b"\x00\x00"
    b.write_bytes(body)

    from rfw_tpu.scene import MaterialList, load_object
    oa = load_object(str(a), MaterialList())
    ob = load_object(str(b), MaterialList())
    ta, tb = oa.meshes[0].triangles(), ob.meshes[0].triangles()
    assert ta.count == tb.count == 2
    assert np.allclose(np.sort(ta.vertices.reshape(-1, 3), axis=0),
                       np.sort(tb.vertices.reshape(-1, 3), axis=0))
    assert np.allclose(ta.area.sum(), 1.0, atol=1e-6)
    # smooth normals are unit
    assert np.allclose(np.linalg.norm(ta.normals, axis=-1), 1.0, atol=1e-5)


_DAE = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <asset><up_axis>Y_UP</up_axis></asset>
 <library_effects>
  <effect id="red-fx"><profile_COMMON><technique sid="common">
   <lambert><diffuse><color>0.8 0.1 0.1 1</color></diffuse></lambert>
  </technique></profile_COMMON></effect>
 </library_effects>
 <library_materials>
  <material id="red"><instance_effect url="#red-fx"/></material>
 </library_materials>
 <library_geometries>
  <geometry id="quad"><mesh>
   <source id="pos"><float_array id="pa" count="12">
     0 0 0  1 0 0  1 1 0  0 1 0</float_array>
    <technique_common><accessor source="#pa" count="4" stride="3">
     <param name="X" type="float"/><param name="Y" type="float"/>
     <param name="Z" type="float"/></accessor></technique_common>
   </source>
   <vertices id="vtx"><input semantic="POSITION" source="#pos"/></vertices>
   <polylist material="m0" count="1">
    <input semantic="VERTEX" source="#vtx" offset="0"/>
    <vcount>4</vcount>
    <p>0 1 2 3</p>
   </polylist>
  </mesh></geometry>
 </library_geometries>
 <library_visual_scenes>
  <visual_scene id="scene">
   <node id="n0">
    <translate>2 0 0</translate>
    <instance_geometry url="#quad">
     <bind_material><technique_common>
      <instance_material symbol="m0" target="#red"/>
     </technique_common></bind_material>
    </instance_geometry>
   </node>
  </visual_scene>
 </library_visual_scenes>
 <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""


def test_collada_polylist(tmp_path):
    """Fan-triangulated polylist, node translate, material binding."""
    p = tmp_path / "quad.dae"
    p.write_text(_DAE)
    from rfw_tpu.scene import MaterialList, load_object
    ml = MaterialList()
    obj = load_object(str(p), ml)
    tri = obj.meshes[0].triangles()
    assert tri.count == 2
    # node translate applied
    assert tri.vertices[..., 0].min() >= 2.0 - 1e-6
    assert np.allclose(tri.area.sum(), 1.0, atol=1e-6)
    # bound material has the lambert diffuse color
    mats = ml.generate_device_materials()
    mid = int(np.atleast_1d(tri.material)[0])
    assert np.allclose(mats["color"][mid], [0.8, 0.1, 0.1], atol=1e-6)


def test_collada_malformed(tmp_path):
    p = tmp_path / "bad.dae"
    p.write_text("<notcollada/>")
    from rfw_tpu.scene import MaterialList, load_object
    with pytest.raises(ValueError):
        load_object(str(p), MaterialList())


def test_skybox_bin_cache(tmp_path):
    """Decoded skybox pixels round-trip through the .bin sidecar cache
    (reference skybox.cpp:87-139 parity)."""
    import numpy as np
    from rfw_tpu.scene.skybox import Skybox
    from rfw_tpu.utils import image as image_io

    rng = np.random.default_rng(3)
    img = (rng.random((16, 32, 3)) * 255).astype(np.uint8)
    src = tmp_path / "sky.png"
    image_io.save_png(str(src), img)

    first = Skybox.load(str(src))
    assert (tmp_path / "sky.png.bin").exists()
    second = Skybox.load(str(src))          # served from cache
    assert np.array_equal(first.pixels, second.pixels)

    # stale cache (source newer) is ignored and rebuilt
    import os, time
    time.sleep(0.01)
    image_io.save_png(str(src), img[:, :, ::-1])
    os.utime(src)
    third = Skybox.load(str(src))
    assert third.pixels.shape == first.pixels.shape
    assert not np.array_equal(third.pixels, first.pixels)
