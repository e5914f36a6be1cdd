"""Wavefront OBJ/MTL loader → SceneObject.

Plays the role of the reference's Assimp path
(/root/reference/RFW/system/src/rfw/geometry/assimp/object.cpp:88-323) for the
formats the bundled assets actually use (sponza/dragon/legocar/lpshead are
.obj). Triangulates polygon fans, generates smooth normals when absent
(matching the reference's aiProcess_GenSmoothNormals import flag), splits one
SceneMesh per material group.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import logger
from .materials import (HostMaterial, MapProps, MaterialList, TEX_ALPHA,
                        TEX_DIFFUSE, TEX_NORMAL, TEX_SPECULARITY)
from .mesh import SceneMesh
from .object import SceneObject


def _parse_mtl(path: str, materials: MaterialList) -> dict[str, int]:
    """MTL file → {material name: material id}; maps Kd/Ks/Ns/Ni/d/Ke and
    map_Kd / map_bump / map_d to the HostMaterial slots (cf. the assimp
    property conversion, assimp/object.cpp:122-200)."""
    out: dict[str, int] = {}
    if not os.path.exists(path):
        logger.warning("mtl file not found: %s", path)
        return out
    basedir = os.path.dirname(path)
    cur: HostMaterial | None = None
    name = None

    def flush():
        if cur is not None and name is not None:
            out[name] = materials.add(cur)

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                flush()
                name = parts[1] if len(parts) > 1 else "unnamed"
                cur = HostMaterial(name=name, roughness=1.0)
            elif cur is None:
                continue
            elif key == "Kd":
                cur.color = np.asarray([float(v) for v in parts[1:4]],
                                       np.float32)
            elif key == "Ke":
                ke = np.asarray([float(v) for v in parts[1:4]], np.float32)
                if np.any(ke > 0):
                    cur.color = np.ones(3, np.float32) + ke
            elif key == "Ks":
                # specular strength from the Ks luminance
                cur.specular = float(np.mean([float(v) for v in parts[1:4]]))
            elif key == "Ns":
                # Phong exponent → roughness (Blinn-Phong to GGX heuristic)
                ns = max(float(parts[1]), 1.0)
                cur.roughness = float(np.sqrt(2.0 / (ns + 2.0)))
            elif key == "Ni":
                cur.eta = float(parts[1])
            elif key == "d":
                alpha = float(parts[1])
                if alpha < 1.0:
                    cur.transmission = 1.0 - alpha
            elif key == "illum":
                mode = int(float(parts[1]))
                if mode >= 5:
                    cur.metallic = 1.0
                    cur.roughness = min(cur.roughness, 0.05)
            elif key == "map_Kd":
                cur.maps[TEX_DIFFUSE] = MapProps(
                    texture_id=materials.add_texture_from_file(
                        os.path.join(basedir, parts[-1].replace("\\", "/"))))
            elif key in ("map_bump", "bump", "map_Bump"):
                tid = materials.add_texture_from_file(
                    os.path.join(basedir, parts[-1].replace("\\", "/")))
                cur.maps[TEX_NORMAL] = MapProps(texture_id=tid)
            elif key == "map_Ks":
                cur.maps[TEX_SPECULARITY] = MapProps(
                    texture_id=materials.add_texture_from_file(
                        os.path.join(basedir, parts[-1].replace("\\", "/"))))
            elif key == "map_d":
                cur.maps[TEX_ALPHA] = MapProps(
                    texture_id=materials.add_texture_from_file(
                        os.path.join(basedir, parts[-1].replace("\\", "/"))))
                cur.alpha_cutout = True
    flush()
    return out


def _smooth_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (aiProcess_GenSmoothNormals analog)."""
    tri = positions[indices]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    normals = np.zeros_like(positions)
    for c in range(3):
        np.add.at(normals, indices[:, c], fn)
    ln = np.linalg.norm(normals, axis=-1, keepdims=True)
    return (normals / np.maximum(ln, 1e-20)).astype(np.float32)


def load_obj(path: str, materials: MaterialList,
             material_override: int = -1) -> SceneObject:
    obj = SceneObject(name=os.path.basename(path))
    basedir = os.path.dirname(os.path.abspath(path))

    positions: list[list[float]] = []
    normals: list[list[float]] = []
    texcoords: list[list[float]] = []
    mtl_ids: dict[str, int] = {}
    default_mat = (material_override if material_override >= 0 else None)

    # faces bucketed by material id; each corner is (vi, ti, ni)
    faces_by_mat: dict[int, list[tuple]] = {}
    cur_mat = -1

    def corner(token: str) -> tuple[int, int, int]:
        comps = token.split("/")
        vi = int(comps[0])
        ti = int(comps[1]) if len(comps) > 1 and comps[1] else 0
        ni = int(comps[2]) if len(comps) > 2 and comps[2] else 0
        # negative indices are relative to current array end
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = ti - 1 if ti > 0 else (len(texcoords) + ti if ti else -1)
        ni = ni - 1 if ni > 0 else (len(normals) + ni if ni else -1)
        return vi, ti, ni

    with open(path, "r", errors="replace") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            parts = line.split()
            if not parts:
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(parts[1]), float(parts[2]),
                                  float(parts[3])])
            elif key == "vn":
                normals.append([float(parts[1]), float(parts[2]),
                                float(parts[3])])
            elif key == "vt":
                texcoords.append([float(parts[1]),
                                  float(parts[2]) if len(parts) > 2 else 0.0])
            elif key == "f":
                corners = [corner(t) for t in parts[1:]]
                bucket = faces_by_mat.setdefault(cur_mat, [])
                for i in range(1, len(corners) - 1):  # fan triangulation
                    bucket.append((corners[0], corners[i], corners[i + 1]))
            elif key == "mtllib" and material_override < 0:
                mtl_ids.update(_parse_mtl(
                    os.path.join(basedir, " ".join(parts[1:])), materials))
            elif key == "usemtl":
                mname = " ".join(parts[1:])
                if material_override >= 0:
                    cur_mat = material_override
                elif mname in mtl_ids:
                    cur_mat = mtl_ids[mname]
                else:
                    cur_mat = -1

    pos_arr = np.asarray(positions, np.float32)
    nrm_arr = np.asarray(normals, np.float32) if normals else None
    uv_arr = np.asarray(texcoords, np.float32) if texcoords else None

    if default_mat is None:
        default_mat = materials.add(HostMaterial(name=f"{obj.name}:default"))

    # Build one mesh per material bucket. OBJ indexes pos/uv/normal
    # independently; deduplicate (vi,ti,ni) triplets per bucket.
    for mat_id, faces in faces_by_mat.items():
        mat = mat_id if mat_id >= 0 else default_mat
        triplets: dict[tuple, int] = {}
        tri_indices = np.empty((len(faces), 3), np.int32)
        order: list[tuple] = []
        for fi, tri in enumerate(faces):
            for ci, key in enumerate(tri):
                slot = triplets.get(key)
                if slot is None:
                    slot = len(order)
                    triplets[key] = slot
                    order.append(key)
                tri_indices[fi, ci] = slot
        vidx = np.array([k[0] for k in order], np.int64)
        mesh_pos = pos_arr[vidx]
        mesh_uv = None
        if uv_arr is not None:
            tidx = np.array([k[1] for k in order], np.int64)
            mesh_uv = np.where((tidx >= 0)[:, None],
                               uv_arr[np.clip(tidx, 0, len(uv_arr) - 1)], 0.0)
            mesh_uv = mesh_uv.astype(np.float32)
        if nrm_arr is not None and all(k[2] >= 0 for k in order):
            nidx = np.array([k[2] for k in order], np.int64)
            mesh_nrm = nrm_arr[nidx]
        else:
            mesh_nrm = _smooth_normals(mesh_pos, tri_indices)
        obj.meshes.append(SceneMesh(
            positions=mesh_pos, indices=tri_indices, normals=mesh_nrm,
            uv=mesh_uv, material_ids=mat))

    obj.finalize()
    return obj
