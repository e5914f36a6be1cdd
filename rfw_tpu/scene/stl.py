"""STL loader (binary + ASCII) → SceneObject.

Part of the Assimp-breadth surface of the reference
(/root/reference/RFW/system/src/rfw/geometry/assimp/object.cpp:88-91 — Assimp
reads STL among "any format"). STL carries bare triangle soup with facet
normals; vertices are deduplicated and smooth normals generated, matching the
reference's aiProcess_GenSmoothNormals import flag.
"""

from __future__ import annotations

import struct

import numpy as np

from .materials import HostMaterial, MaterialList
from .mesh import SceneMesh
from .object import SceneObject


def _parse_binary(data: bytes) -> np.ndarray:
    n = struct.unpack("<I", data[80:84])[0]
    if 84 + n * 50 > len(data):
        raise ValueError("malformed binary STL: truncated facet data")
    rec = np.frombuffer(data[84:84 + n * 50], dtype=np.uint8)
    rec = rec.reshape(n, 50)
    f = rec[:, :48].copy().view("<f4").reshape(n, 12)
    return f[:, 3:12].reshape(n, 3, 3).astype(np.float32)


def _parse_ascii(text: str) -> np.ndarray:
    verts = []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) == 4 and parts[0] == "vertex":
            verts.append([float(parts[1]), float(parts[2]),
                          float(parts[3])])
    if len(verts) % 3:
        raise ValueError("malformed ASCII STL: vertex count not a "
                         "multiple of 3")
    return np.asarray(verts, np.float32).reshape(-1, 3, 3)


def load_stl(path: str, materials: MaterialList,
             material_override: int = -1) -> SceneObject:
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 84:
        raise ValueError(f"malformed STL (too short): {path}")
    is_ascii = data[:5] == b"solid"
    if is_ascii:
        # some binary files start with "solid" — trust the facet count
        try:
            n = struct.unpack("<I", data[80:84])[0]
            if 84 + n * 50 == len(data):
                is_ascii = False
        except struct.error:
            pass
    tris = (_parse_ascii(data.decode("ascii", errors="replace"))
            if is_ascii else _parse_binary(data))
    if tris.shape[0] == 0:
        raise ValueError(f"STL contains no triangles: {path}")

    # dedup vertices → indexed mesh (smooth normals come from shared verts)
    flat = tris.reshape(-1, 3)
    uniq, inv = np.unique(flat.round(decimals=6), axis=0,
                          return_inverse=True)
    indices = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate triangles (STL files are famously dirty)
    keep = ((indices[:, 0] != indices[:, 1])
            & (indices[:, 1] != indices[:, 2])
            & (indices[:, 0] != indices[:, 2]))
    indices = indices[keep]

    mat = (material_override if material_override >= 0 else
           materials.add(HostMaterial(name="stl", color=np.array(
               [0.7, 0.7, 0.7], np.float32), roughness=1.0)))

    # area-weighted smooth normals (aiProcess_GenSmoothNormals analog)
    e1 = uniq[indices[:, 1]] - uniq[indices[:, 0]]
    e2 = uniq[indices[:, 2]] - uniq[indices[:, 0]]
    fn = np.cross(e1, e2)
    normals = np.zeros_like(uniq)
    for k in range(3):
        np.add.at(normals, indices[:, k], fn)
    ln = np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = (normals / np.maximum(ln, 1e-20)).astype(np.float32)

    obj = SceneObject(name=path)
    obj.meshes.append(SceneMesh(
        positions=uniq.astype(np.float32), indices=indices,
        normals=normals, material_ids=mat))
    obj.finalize()
    return obj
