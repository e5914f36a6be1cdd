"""COLLADA (.dae) loader → SceneObject.

Covers the static-geometry subset of the reference's Assimp Collada path
(/root/reference/RFW/system/src/rfw/geometry/assimp/object.cpp:88-91):
library_geometries (triangles + polylist with VERTEX/NORMAL/TEXCOORD
inputs), library_materials/effects (lambert/phong/blinn diffuse color or
texture, emission, shininess), and library_visual_scenes node transforms
(matrix / translate / rotate / scale, nested nodes, instance_geometry with
material binding). Skinning/animation via Collada is out of scope (use glTF
for animated assets — the reference's own samples do the same).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from ..utils import logger
from .materials import HostMaterial, MapProps, MaterialList, TEX_DIFFUSE
from .mesh import SceneMesh
from .object import SceneObject


def _strip(tag: str) -> str:
    return tag.split("}", 1)[-1]


def _floats(text: str) -> np.ndarray:
    return np.fromstring(text, sep=" ", dtype=np.float32) if False else \
        np.asarray([float(x) for x in (text or "").split()], np.float32)


def _ints(text: str) -> np.ndarray:
    return np.asarray([int(x) for x in (text or "").split()], np.int64)


class _Doc:
    """Namespace-agnostic element index by id."""

    def __init__(self, root):
        self.root = root
        self.by_id = {}
        for el in root.iter():
            i = el.get("id")
            if i is not None:
                self.by_id[i] = el

    def deref(self, url):
        return self.by_id.get((url or "").lstrip("#"))

    def find(self, el, name):
        for c in el:
            if _strip(c.tag) == name:
                return c
        return None

    def findall(self, el, name):
        return [c for c in el if _strip(c.tag) == name]

    def iterfind(self, el, name):
        return [c for c in el.iter() if _strip(c.tag) == name]


def _parse_effect_color(doc, eff, texture_samplers):
    """effect → (rgb color, emissive rgb, roughness, diffuse texture path)."""
    color = np.array([0.7, 0.7, 0.7], np.float32)
    emissive = np.zeros(3, np.float32)
    rough = 1.0
    tex = None
    for shader in ("lambert", "phong", "blinn", "constant"):
        nodes = doc.iterfind(eff, shader)
        if not nodes:
            continue
        sh = nodes[0]
        dif = doc.find(sh, "diffuse")
        if dif is not None:
            c = doc.find(dif, "color")
            if c is not None:
                color = _floats(c.text)[:3]
            t = doc.find(dif, "texture")
            if t is not None:
                tex = texture_samplers.get(t.get("texture"), None)
        emi = doc.find(sh, "emission")
        if emi is not None:
            c = doc.find(emi, "color")
            if c is not None:
                emissive = _floats(c.text)[:3]
        shin = doc.find(sh, "shininess")
        if shin is not None:
            f = doc.find(shin, "float")
            if f is not None:
                # Blinn exponent → roughness (Beckmann-ish mapping)
                exp = max(float(f.text), 1.0)
                rough = float(np.clip(np.sqrt(2.0 / (exp + 2.0)), 0.02, 1.0))
        break
    return color, emissive, rough, tex


def _parse_materials(doc, basedir, materials: MaterialList):
    """library_materials/effects/images → {material id: host material id}."""
    images = {}
    for img in doc.iterfind(doc.root, "image"):
        init = doc.find(img, "init_from")
        if init is not None and init.text:
            images[img.get("id")] = init.text.strip()

    out = {}
    for mat in doc.iterfind(doc.root, "material"):
        ie = doc.find(mat, "instance_effect")
        eff = doc.deref(ie.get("url")) if ie is not None else None
        if eff is None:
            continue
        # sampler/surface indirection: sid → image id
        samplers = {}
        surfaces = {}
        for np_ in doc.iterfind(eff, "newparam"):
            sid = np_.get("sid")
            surf = doc.find(np_, "surface")
            if surf is not None:
                init = doc.find(surf, "init_from")
                if init is not None:
                    surfaces[sid] = init.text.strip()
            s2d = doc.find(np_, "sampler2D")
            if s2d is not None:
                src = doc.find(s2d, "source")
                if src is not None:
                    samplers[sid] = src.text.strip()
        tex_by_sampler = {}
        for sid, surf_sid in samplers.items():
            img_id = surfaces.get(surf_sid, surf_sid)
            if img_id in images:
                tex_by_sampler[sid] = images[img_id]
        # direct texture="imageid" files exist in the wild too
        for iid, pathv in images.items():
            tex_by_sampler.setdefault(iid, pathv)

        color, emissive, rough, tex = _parse_effect_color(
            doc, eff, tex_by_sampler)
        hm = HostMaterial(name=mat.get("id", "dae"), roughness=rough)
        # Emissive materials must satisfy the is_emissive() color>1
        # convention (materials.py). Preserve the AUTHORED radiance: values
        # already >1 pass through; dim emission (e.g. 0.2) is scaled
        # uniformly to just cross the threshold so it still registers as a
        # light without a 6x brightness error; negligible emission keeps
        # the diffuse color.
        if np.any(emissive > 1.0):
            hm.color = emissive.astype(np.float32)
        elif np.any(emissive > 1e-3):
            scale = 1.0001 / float(np.max(emissive))
            hm.color = (emissive * scale).astype(np.float32)
        else:
            hm.color = color
        if tex:
            tp = os.path.normpath(os.path.join(basedir, tex))
            hm.maps[TEX_DIFFUSE] = MapProps(path=tp)
        out[mat.get("id")] = materials.add(hm)
    return out


def _read_source(doc, mesh_el, url):
    src = doc.deref(url)
    if src is None:
        return None
    arr = doc.find(src, "float_array")
    if arr is None:
        return None
    data = _floats(arr.text)
    acc = doc.iterfind(src, "accessor")
    stride = int(acc[0].get("stride", "3")) if acc else 3
    return data.reshape(-1, stride)


def _prim_arrays(doc, mesh_el, prim):
    """triangles/polylist element → (positions, normals, uv, tri count)."""
    inputs = []
    for inp in doc.findall(prim, "input"):
        sem = inp.get("semantic")
        off = int(inp.get("offset", "0"))
        url = inp.get("source")
        if sem == "VERTEX":
            vtx = doc.deref(url)
            pos_url = None
            for inp2 in doc.findall(vtx, "input"):
                if inp2.get("semantic") == "POSITION":
                    pos_url = inp2.get("source")
            inputs.append(("POSITION", off, pos_url))
        else:
            inputs.append((sem, off, url))
    stride = max(off for _, off, _ in inputs) + 1

    p_el = doc.find(prim, "p")
    if p_el is None:
        return None
    idx = _ints(p_el.text)

    vcount_el = doc.find(prim, "vcount")
    if _strip(prim.tag) == "polylist" and vcount_el is not None:
        vcounts = _ints(vcount_el.text)
    else:
        vcounts = np.full(len(idx) // (3 * stride), 3, np.int64)

    # fan-triangulate polygons into corner index lists per input offset
    corners = idx.reshape(-1, stride)
    tri_corner_ids = []
    base = 0
    for vc in vcounts:
        for k in range(1, int(vc) - 1):
            tri_corner_ids.extend([base, base + k, base + k + 1])
        base += int(vc)
    tri_corner_ids = np.asarray(tri_corner_ids, np.int64)

    out = {}
    for sem, off, url in inputs:
        src = _read_source(doc, mesh_el, url)
        if src is None:
            continue
        out[sem] = src[corners[tri_corner_ids, off]]
    return out


_AXIS_FIX = {"Z_UP": np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                               [0, -1, 0, 0], [0, 0, 0, 1]], np.float32),
             "X_UP": np.array([[0, -1, 0, 0], [1, 0, 0, 0],
                               [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)}


def _node_transform(doc, node):
    m = np.eye(4, dtype=np.float32)
    for c in node:
        tag = _strip(c.tag)
        if tag == "matrix":
            m = m @ _floats(c.text).reshape(4, 4)
        elif tag == "translate":
            t = np.eye(4, dtype=np.float32)
            t[:3, 3] = _floats(c.text)[:3]
            m = m @ t
        elif tag == "scale":
            s = np.diag([*_floats(c.text)[:3], 1.0]).astype(np.float32)
            m = m @ s
        elif tag == "rotate":
            v = _floats(c.text)
            ax = v[:3] / max(np.linalg.norm(v[:3]), 1e-9)
            ang = np.deg2rad(v[3])
            cth, sth = np.cos(ang), np.sin(ang)
            x, y, z = ax
            r = np.eye(4, dtype=np.float32)
            r[:3, :3] = np.array([
                [cth + x * x * (1 - cth), x * y * (1 - cth) - z * sth,
                 x * z * (1 - cth) + y * sth],
                [y * x * (1 - cth) + z * sth, cth + y * y * (1 - cth),
                 y * z * (1 - cth) - x * sth],
                [z * x * (1 - cth) - y * sth, z * y * (1 - cth) + x * sth,
                 cth + z * z * (1 - cth)]], np.float32)
            m = m @ r
    return m


def load_collada(path: str, materials: MaterialList,
                 material_override: int = -1) -> SceneObject:
    try:
        root = ET.parse(path).getroot()
    except ET.ParseError as e:
        raise ValueError(f"malformed COLLADA XML in {path}: {e}") from e
    if _strip(root.tag) != "COLLADA":
        raise ValueError(f"not a COLLADA document: {path}")
    doc = _Doc(root)
    basedir = os.path.dirname(os.path.abspath(path))

    up = "Y_UP"
    for ua in doc.iterfind(root, "up_axis"):
        up = (ua.text or "Y_UP").strip()
    axis_fix = _AXIS_FIX.get(up, np.eye(4, dtype=np.float32))

    mat_ids = ({} if material_override >= 0 else
               _parse_materials(doc, basedir, materials))
    default_mat = material_override
    if default_mat < 0:
        default_mat = materials.add(HostMaterial(name="dae-default",
                                                 roughness=1.0))

    obj = SceneObject(name=path)

    def emit_geometry(geom, transform, bind_map):
        mesh_el = doc.find(geom, "mesh")
        if mesh_el is None:
            return
        nrm_mat = np.linalg.inv(transform[:3, :3]).T \
            if abs(np.linalg.det(transform[:3, :3])) > 1e-12 \
            else transform[:3, :3]
        for prim in list(doc.findall(mesh_el, "triangles")) + \
                list(doc.findall(mesh_el, "polylist")):
            arrays = _prim_arrays(doc, mesh_el, prim)
            if not arrays or "POSITION" not in arrays:
                continue
            pos = arrays["POSITION"][:, :3]
            pos = pos @ transform[:3, :3].T + transform[:3, 3]
            nt = len(pos) // 3
            if nt == 0:
                continue
            normals = None
            if "NORMAL" in arrays:
                nr = arrays["NORMAL"][:, :3] @ nrm_mat.T
                nr /= np.maximum(
                    np.linalg.norm(nr, axis=-1, keepdims=True), 1e-20)
                normals = nr.astype(np.float32)
            uv = None
            if "TEXCOORD" in arrays:
                uv = arrays["TEXCOORD"][:, :2].astype(np.float32)
                uv[:, 1] = 1.0 - uv[:, 1]     # Collada V-up → texture V-down
            sym = prim.get("material")
            mid = bind_map.get(sym, mat_ids.get(sym, default_mat))
            if material_override >= 0:
                mid = material_override
            obj.meshes.append(SceneMesh(
                positions=pos.astype(np.float32),
                indices=np.arange(nt * 3, dtype=np.int32).reshape(-1, 3),
                normals=normals, uv=uv, material_ids=mid))

    def walk(node, parent_m):
        m = parent_m @ _node_transform(doc, node)
        for ig in doc.findall(node, "instance_geometry"):
            geom = doc.deref(ig.get("url"))
            if geom is None:
                continue
            bind = {}
            for im in doc.iterfind(ig, "instance_material"):
                tgt = doc.deref(im.get("target"))
                if tgt is not None:
                    bind[im.get("symbol")] = mat_ids.get(
                        tgt.get("id"), default_mat)
            emit_geometry(geom, m, bind)
        for child in doc.findall(node, "node"):
            walk(child, m)

    scenes = doc.iterfind(root, "visual_scene")
    if scenes:
        for node in doc.findall(scenes[0], "node"):
            walk(node, axis_fix)
    else:   # no scene graph: dump all geometries at identity
        for geom in doc.iterfind(root, "geometry"):
            emit_geometry(geom, axis_fix, {})

    if not obj.meshes:
        raise ValueError(f"COLLADA file contains no triangle geometry: "
                         f"{path}")
    logger.debug("collada: %s → %d meshes, %d materials", path,
                 len(obj.meshes), len(mat_ids))
    obj.finalize()
    return obj
