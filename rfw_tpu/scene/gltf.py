"""Pure-Python glTF 2.0 loader (.gltf / .glb) → SceneObject.

Replaces the reference's tinygltf-based loader
(/root/reference/RFW/system/src/rfw/geometry/gltf/object.cpp:72-617) with a
dependency-free implementation: JSON + binary buffers → SceneMesh SoA,
HostMaterials (baseColorFactor → color, emissiveFactor → color = 1 + emissive,
object.cpp:111-159), node hierarchy, skins, morph targets and animations.
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from ..utils import logger
from .animation import (Animation, Channel, CUBICSPLINE, LINEAR, Sampler,
                        STEP)
from .materials import (HostMaterial, MaterialList, TEX_DIFFUSE, TEX_NORMAL,
                        TEX_ROUGHNESS)
from .mesh import SceneMesh
from .object import SceneNode, SceneObject, Skin

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}
_NORMALIZE_SCALE = {
    np.dtype(np.int8): 127.0, np.dtype(np.uint8): 255.0,
    np.dtype(np.int16): 32767.0, np.dtype(np.uint16): 65535.0,
}


class _Gltf:
    """Parsed document: JSON tree + raw buffer bytes + accessor decoding."""

    def __init__(self, doc: dict, buffers: list[bytes], basedir: str):
        self.doc = doc
        self.buffers = buffers
        self.basedir = basedir

    @staticmethod
    def parse(path: str) -> "_Gltf":
        basedir = os.path.dirname(os.path.abspath(path))
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] == b"glTF":  # GLB container
            magic, version, _length = struct.unpack("<III", data[:12])
            off = 12
            doc = None
            bin_chunk = b""
            while off < len(data):
                clen, ctype = struct.unpack("<II", data[off:off + 8])
                chunk = data[off + 8:off + 8 + clen]
                if ctype == 0x4E4F534A:       # 'JSON'
                    doc = json.loads(chunk.decode("utf-8"))
                elif ctype == 0x004E4942:     # 'BIN\0'
                    bin_chunk = chunk
                off += 8 + clen
            assert doc is not None, "GLB without JSON chunk"
            g = _Gltf(doc, [], basedir)
            g.buffers = [g._load_buffer(b, bin_chunk)
                         for b in doc.get("buffers", [])]
            return g
        doc = json.loads(data.decode("utf-8"))
        g = _Gltf(doc, [], basedir)
        g.buffers = [g._load_buffer(b, b"") for b in doc.get("buffers", [])]
        return g

    def _load_buffer(self, buf: dict, glb_bin: bytes) -> bytes:
        uri = buf.get("uri")
        if uri is None:
            return glb_bin
        if uri.startswith("data:"):
            return base64.b64decode(uri.split(",", 1)[1])
        from urllib.parse import unquote
        with open(os.path.join(self.basedir, unquote(uri)), "rb") as f:
            return f.read()

    def accessor(self, idx: int) -> np.ndarray:
        """Decode accessor → (count, components) float32/int array
        (handles strides, normalization, sparse)."""
        acc = self.doc["accessors"][idx]
        count = acc["count"]
        dtype = np.dtype(_COMPONENT_DTYPES[acc["componentType"]])
        ncomp = _TYPE_COUNTS[acc["type"]]

        if "bufferView" in acc:
            bv = self.doc["bufferViews"][acc["bufferView"]]
            raw = self.buffers[bv.get("buffer", 0)]
            start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = bv.get("byteStride") or dtype.itemsize * ncomp
            if stride == dtype.itemsize * ncomp:
                arr = np.frombuffer(
                    raw, dtype=dtype, count=count * ncomp, offset=start
                ).reshape(count, ncomp).copy()
            else:
                out = np.empty((count, ncomp), dtype)
                for i in range(count):
                    off = start + i * stride
                    out[i] = np.frombuffer(raw, dtype=dtype, count=ncomp,
                                           offset=off)
                arr = out
        else:
            arr = np.zeros((count, ncomp), dtype)

        sparse = acc.get("sparse")
        if sparse:
            sc = sparse["count"]
            iacc = sparse["indices"]
            idt = np.dtype(_COMPONENT_DTYPES[iacc["componentType"]])
            ibv = self.doc["bufferViews"][iacc["bufferView"]]
            iraw = self.buffers[ibv.get("buffer", 0)]
            ioff = ibv.get("byteOffset", 0) + iacc.get("byteOffset", 0)
            sidx = np.frombuffer(iraw, dtype=idt, count=sc, offset=ioff)
            vacc = sparse["values"]
            vbv = self.doc["bufferViews"][vacc["bufferView"]]
            vraw = self.buffers[vbv.get("buffer", 0)]
            voff = vbv.get("byteOffset", 0) + vacc.get("byteOffset", 0)
            vals = np.frombuffer(vraw, dtype=dtype, count=sc * ncomp,
                                 offset=voff).reshape(sc, ncomp)
            arr[sidx.astype(np.int64)] = vals

        if acc.get("normalized") and dtype in _NORMALIZE_SCALE:
            scale = _NORMALIZE_SCALE[dtype]
            arr = np.clip(arr.astype(np.float32) / scale,
                          -1.0 if dtype.kind == "i" else 0.0, 1.0)
        return arr


def _convert_material(gmat: dict, tex_ids: list[int]) -> HostMaterial:
    """glTF material → HostMaterial (object.cpp:102-163)."""
    mat = HostMaterial(name=gmat.get("name", "unnamed"),
                       roughness=1.0, specular=0.5, metallic=1.0)
    pbr = gmat.get("pbrMetallicRoughness", {})
    if "baseColorFactor" in pbr:
        mat.color = np.asarray(pbr["baseColorFactor"][:3], np.float32)
    mat.metallic = float(pbr.get("metallicFactor", 1.0))
    mat.roughness = float(pbr.get("roughnessFactor", 1.0))
    if "baseColorTexture" in pbr:
        ti = pbr["baseColorTexture"].get("index", -1)
        if 0 <= ti < len(tex_ids):
            mat.maps[TEX_DIFFUSE].texture_id = tex_ids[ti]
    if "metallicRoughnessTexture" in pbr:
        ti = pbr["metallicRoughnessTexture"].get("index", -1)
        if 0 <= ti < len(tex_ids):
            mat.maps[TEX_ROUGHNESS].texture_id = tex_ids[ti]
    if "normalTexture" in gmat:
        ti = gmat["normalTexture"].get("index", -1)
        if 0 <= ti < len(tex_ids):
            mat.maps[TEX_NORMAL].texture_id = tex_ids[ti]
            mat.maps[TEX_NORMAL].value_scale = float(
                gmat["normalTexture"].get("scale", 1.0))
    if gmat.get("alphaMode") in ("MASK", "BLEND"):
        mat.alpha_cutout = True
    emissive = np.asarray(gmat.get("emissiveFactor", [0, 0, 0]), np.float32)
    strength = float(gmat.get("extensions", {}).get(
        "KHR_materials_emissive_strength", {}).get("emissiveStrength", 1.0))
    if np.any(emissive > 0):
        # emissive → color = 1 + emissive (object.cpp:152-159)
        mat.color = (np.ones(3, np.float32) + emissive * strength)
    return mat


def load_gltf(path: str, materials: MaterialList,
              material_override: int = -1) -> SceneObject:
    """Load a .gltf/.glb file; registers materials/textures into ``materials``
    and returns a SceneObject ready for the render system."""
    g = _Gltf.parse(path)
    doc = g.doc
    obj = SceneObject(name=os.path.basename(path))

    # Textures (dedup by image source path or embedded bytes)
    tex_ids: list[int] = []
    from .texture import Texture
    for gtex in doc.get("textures", []):
        src = gtex.get("source", -1)
        if src < 0:
            tex_ids.append(-1)
            continue
        img = doc["images"][src]
        try:
            if "uri" in img and not img["uri"].startswith("data:"):
                from urllib.parse import unquote
                tex_ids.append(materials.add_texture_from_file(
                    os.path.join(g.basedir, unquote(img["uri"]))))
            else:
                if "uri" in img:
                    raw = base64.b64decode(img["uri"].split(",", 1)[1])
                else:
                    bv = doc["bufferViews"][img["bufferView"]]
                    raw = g.buffers[bv.get("buffer", 0)][
                        bv.get("byteOffset", 0):
                        bv.get("byteOffset", 0) + bv["byteLength"]]
                import io
                from PIL import Image
                arr = np.asarray(
                    Image.open(io.BytesIO(raw)).convert("RGBA"),
                    np.float32) / 255.0
                from ..utils.image import srgb_to_linear
                arr = np.concatenate(
                    [srgb_to_linear(arr[..., :3]), arr[..., 3:4]], axis=-1)
                tex_ids.append(materials.add_texture(Texture.from_array(arr)))
        except Exception as e:
            logger.warning("gltf: texture load failed (%s)", e)
            tex_ids.append(-1)

    # Materials
    if material_override >= 0:
        mat_ids = []
    else:
        mat_ids = [materials.add(_convert_material(m, tex_ids))
                   for m in doc.get("materials", [])]
    default_mat = (material_override if material_override >= 0
                   else materials.add(HostMaterial(name=f"{obj.name}:default")))

    # Meshes: one SceneMesh per primitive (object.cpp prepare_meshes)
    mesh_map: list[list[int]] = []  # glTF mesh idx → list of SceneMesh ids
    for gmesh in doc.get("meshes", []):
        ids = []
        for prim in gmesh.get("primitives", []):
            if prim.get("mode", 4) != 4:   # TRIANGLES only
                logger.warning("gltf: skipping non-triangle primitive")
                continue
            attrs = prim["attributes"]
            pos = g.accessor(attrs["POSITION"]).astype(np.float32)
            if "indices" in prim:
                idxs = g.accessor(prim["indices"]).astype(np.int64)
                idxs = idxs.reshape(-1, 3).astype(np.int32)
            else:
                idxs = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
            normals = (g.accessor(attrs["NORMAL"]).astype(np.float32)
                       if "NORMAL" in attrs else None)
            uv = (g.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                  if "TEXCOORD_0" in attrs else None)
            joints = (g.accessor(attrs["JOINTS_0"]).astype(np.int32)
                      if "JOINTS_0" in attrs else None)
            weights = None
            if "WEIGHTS_0" in attrs:
                weights = g.accessor(attrs["WEIGHTS_0"]).astype(np.float32)
                s = weights.sum(-1, keepdims=True)
                weights = np.where(s > 0, weights / np.maximum(s, 1e-9),
                                   weights)
            pm = prim.get("material", -1)
            mid = mat_ids[pm] if 0 <= pm < len(mat_ids) else default_mat

            # morph targets
            morph_pos = morph_nrm = None
            targets = prim.get("targets", [])
            if targets:
                mp, mn = [], []
                for tgt in targets:
                    mp.append(g.accessor(tgt["POSITION"]).astype(np.float32)
                              if "POSITION" in tgt else np.zeros_like(pos))
                    if normals is not None:
                        mn.append(
                            g.accessor(tgt["NORMAL"]).astype(np.float32)
                            if "NORMAL" in tgt else np.zeros_like(normals))
                morph_pos = np.stack(mp)
                morph_nrm = np.stack(mn) if mn else None

            mesh = SceneMesh(
                positions=pos.copy(), indices=idxs, normals=normals,
                uv=uv, material_ids=mid,
                base_positions=pos.copy(),
                base_normals=None if normals is None else normals.copy(),
                joints=joints, weights=weights,
                morph_positions=morph_pos, morph_normals=morph_nrm)
            obj.meshes.append(mesh)
            ids.append(len(obj.meshes) - 1)
        mesh_map.append(ids)

    # Nodes
    for gnode in doc.get("nodes", []):
        node = SceneNode(name=gnode.get("name", ""))
        if "matrix" in gnode:
            node.matrix = np.asarray(
                gnode["matrix"], np.float32).reshape(4, 4).T  # column-major
        node.translation = np.asarray(
            gnode.get("translation", [0, 0, 0]), np.float32)
        node.rotation = np.asarray(
            gnode.get("rotation", [0, 0, 0, 1]), np.float32)
        node.scale = np.asarray(gnode.get("scale", [1, 1, 1]), np.float32)
        node.children = list(gnode.get("children", []))
        if "mesh" in gnode:
            node.mesh_ids = list(mesh_map[gnode["mesh"]])
            gm = doc["meshes"][gnode["mesh"]]
            w = gnode.get("weights", gm.get("weights"))
            if w is not None:
                node.morph_weights = np.asarray(w, np.float32)
            if "skin" in gnode:
                node.skin_id = gnode["skin"]
                for mid in node.mesh_ids:
                    obj.meshes[mid].skin_id = gnode["skin"]
        obj.nodes.append(node)

    scene_idx = doc.get("scene", 0)
    scenes = doc.get("scenes", [{}])
    obj.roots = list(scenes[scene_idx].get("nodes",
                                           range(len(obj.nodes))))

    # Skins
    for gskin in doc.get("skins", []):
        joints = list(gskin["joints"])
        if "inverseBindMatrices" in gskin:
            ibm = g.accessor(gskin["inverseBindMatrices"]).astype(np.float32)
            ibm = ibm.reshape(-1, 4, 4).transpose(0, 2, 1)  # column-major
        else:
            ibm = np.tile(np.eye(4, dtype=np.float32), (len(joints), 1, 1))
        obj.skins.append(Skin(joint_nodes=joints, inverse_bind=ibm))

    # Animations
    interp_map = {"LINEAR": LINEAR, "STEP": STEP, "CUBICSPLINE": CUBICSPLINE}
    for ganim in doc.get("animations", []):
        samplers = []
        for gs in ganim.get("samplers", []):
            times = g.accessor(gs["input"]).astype(np.float32).reshape(-1)
            values = g.accessor(gs["output"]).astype(np.float32)
            interp = interp_map.get(gs.get("interpolation", "LINEAR"), LINEAR)
            samplers.append((times, values, interp))
        channels = []
        for gc in ganim.get("channels", []):
            tgt = gc.get("target", {})
            node_id = tgt.get("node", -1)
            if node_id < 0:
                continue
            times, values, interp = samplers[gc["sampler"]]
            path = tgt.get("path", "translation")
            # reshape values by path arity
            if path == "weights":
                n_targets = max(values.size // max(len(times), 1), 1)
                vals = values.reshape(len(times), -1, n_targets) \
                    if interp == CUBICSPLINE else values.reshape(
                        len(times), n_targets)
            elif interp == CUBICSPLINE:
                vals = values.reshape(len(times), 3, -1)
            else:
                vals = values.reshape(len(times), -1)
            channels.append(Channel(
                node_id=node_id, path=path,
                sampler=Sampler(times=times, values=vals,
                                interpolation=interp)))
        obj.animations.append(
            Animation(name=ganim.get("name", ""), channels=channels))

    obj.finalize()
    return obj
