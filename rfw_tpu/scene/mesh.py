"""Scene geometry containers (host side, numpy SoA).

The reference stores loaded models as one ``SceneObject`` holding contiguous
SoA buffers (vertices/normals/indices/texCoords/triangles —
/root/reference/RFW/system/src/rfw/geometry/gltf/hierarcy.h:20-60) sliced into
meshes, each of which becomes one backend mesh slot
(geometry/gltf/object.cpp:602-617). We keep the same shape: ``SceneMesh`` owns
its vertex data + index topology; ``TriangleSoA`` is the flat per-triangle
record pushed over the engine ABI — the SoA analog of the reference's 160-byte
``Triangle`` (context/structs.h:24-65), carrying everything shading needs.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TriangleSoA:
    """Per-triangle SoA mirroring struct Triangle (structs.h:24-65)."""

    vertices: np.ndarray       # (T, 3, 3) v0/v1/v2 positions
    normals: np.ndarray        # (T, 3, 3) per-vertex shading normals
    gnormal: np.ndarray        # (T, 3) geometric normal N
    uv: np.ndarray             # (T, 3, 2) per-vertex texture coords
    tangent: np.ndarray        # (T, 3) T
    bitangent: np.ndarray      # (T, 3) B
    material: np.ndarray       # (T,) int32 material index
    area: np.ndarray           # (T,) float32 world-space area
    lod: np.ndarray            # (T,) float32 texture LOD base
    light_tri_idx: np.ndarray  # (T,) int32 index into area-light list, -1 if none

    @property
    def count(self) -> int:
        return int(self.vertices.shape[0])


def _compute_tangent_frame(gnormal: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Arbitrary-but-stable tangent/bitangent from the geometric normal.

    (The reference derives T/B from UVs when present; we use the frame only
    for BSDF sampling so any orthonormal frame is valid — UV-aligned tangents
    arrive with anisotropy support.) Frisvad-style branchless construction.
    """
    n = gnormal
    sign = np.where(n[:, 2] >= 0.0, 1.0, -1.0).astype(np.float32)
    a = -1.0 / (sign + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = np.stack([1.0 + sign * n[:, 0] * n[:, 0] * a, sign * b,
                  -sign * n[:, 0]], axis=-1)
    bt = np.stack([b, sign + n[:, 1] * n[:, 1] * a, -n[:, 1]], axis=-1)
    return t.astype(np.float32), bt.astype(np.float32)


def build_triangles(
    positions: np.ndarray,        # (V, 3)
    indices: np.ndarray,          # (T, 3) int
    normals: np.ndarray | None = None,       # (V, 3)
    uv: np.ndarray | None = None,            # (V, 2)
    material_ids: np.ndarray | int = 0,      # (T,) or scalar
) -> TriangleSoA:
    """Assemble the flat triangle SoA from indexed vertex data.

    Mirrors SceneObject::updateTriangles (gltf/hierarcy.cpp:29+): gathers
    per-vertex attributes per corner, computes geometric normal, area, LOD.
    """
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    tri_v = positions[indices]                              # (T, 3, 3)
    e1 = tri_v[:, 1] - tri_v[:, 0]
    e2 = tri_v[:, 2] - tri_v[:, 0]
    n = np.cross(e1, e2)
    dlen = np.linalg.norm(n, axis=-1)
    area = (0.5 * dlen).astype(np.float32)
    gn = n / np.maximum(dlen, 1e-20)[:, None]

    if normals is None:
        tri_n = np.repeat(gn[:, None, :], 3, axis=1)
    else:
        tri_n = np.asarray(normals, np.float32)[indices]

    if uv is None:
        tri_uv = np.zeros((indices.shape[0], 3, 2), np.float32)
    else:
        tri_uv = np.asarray(uv, np.float32)[indices]

    if np.isscalar(material_ids):
        mats = np.full(indices.shape[0], material_ids, np.int32)
    else:
        mats = np.asarray(material_ids, np.int32)

    # LOD base: log2 of triangle area over UV area (reference stores a per-tri
    # LOD scalar used with spreadAngle for mip selection).
    uv_e1 = tri_uv[:, 1] - tri_uv[:, 0]
    uv_e2 = tri_uv[:, 2] - tri_uv[:, 0]
    uv_area = 0.5 * np.abs(uv_e1[:, 0] * uv_e2[:, 1] - uv_e1[:, 1] * uv_e2[:, 0])
    lod = np.where(uv_area > 1e-20,
                   0.5 * np.log2(np.maximum(area, 1e-20) /
                                 np.maximum(uv_area, 1e-20)),
                   0.0).astype(np.float32)

    t, bt = _compute_tangent_frame(gn.astype(np.float32))
    return TriangleSoA(
        vertices=tri_v.astype(np.float32),
        normals=tri_n.astype(np.float32),
        gnormal=gn.astype(np.float32),
        uv=tri_uv.astype(np.float32),
        tangent=t,
        bitangent=bt,
        material=mats,
        area=area,
        lod=lod,
        light_tri_idx=np.full(indices.shape[0], -1, np.int32),
    )


@dataclasses.dataclass
class SceneMesh:
    """One drawable mesh = one engine mesh slot (cf. SceneMesh, gltf/mesh.h).

    Holds base (rest-pose) vertex data and, when animated, the currently posed
    copies; ``update_triangles`` refreshes the flat SoA.
    """

    positions: np.ndarray                   # (V, 3) current (posed) positions
    indices: np.ndarray                     # (T, 3) int32
    normals: np.ndarray | None = None       # (V, 3) current normals
    uv: np.ndarray | None = None            # (V, 2)
    material_ids: np.ndarray | int = 0      # (T,) or scalar

    # Skinning / morphing inputs (reference skinning.h:14-33, mesh.cpp:18-165)
    base_positions: np.ndarray | None = None   # rest pose (V, 3)
    base_normals: np.ndarray | None = None
    joints: np.ndarray | None = None           # (V, 4) uint16 joint ids
    weights: np.ndarray | None = None          # (V, 4) float32
    morph_positions: np.ndarray | None = None  # (M, V, 3) position deltas
    morph_normals: np.ndarray | None = None    # (M, V, 3) normal deltas
    skin_id: int = -1

    # Bookkeeping
    mesh_slot: int = -1                      # slot in the render system
    dirty: bool = True
    _triangles: TriangleSoA | None = None

    @property
    def vertex_count(self) -> int:
        return int(self.positions.shape[0])

    @property
    def triangle_count(self) -> int:
        return int(self.indices.shape[0])

    @property
    def is_animated(self) -> bool:
        return (self.skin_id >= 0 or self.morph_positions is not None)

    def triangles(self) -> TriangleSoA:
        if self._triangles is None or self.dirty:
            self._triangles = build_triangles(
                self.positions, self.indices, self.normals, self.uv,
                self.material_ids)
            self.dirty = False
        return self._triangles

    def invalidate(self) -> None:
        self.dirty = True
