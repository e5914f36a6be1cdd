"""SceneObject: node hierarchy + meshes + skins + animations.

The host-side scene graph of one loaded model, mirroring SceneObject /
SceneNode / MeshSkin (/root/reference/RFW/system/src/rfw/geometry/gltf/
hierarcy.h:20-60, node.h:36-40, skinning.h:14-33). ``set_time`` samples every
animation channel, recomputes node world transforms, poses skinned/morphed
meshes and invalidates their triangle SoA — the rebuild of §3.5 in SURVEY.md.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import skinning
from .animation import (Animation, PATH_ROTATION, PATH_SCALE,
                        PATH_TRANSLATION, PATH_WEIGHTS, compose_trs)
from .mesh import SceneMesh


@dataclasses.dataclass
class SceneNode:
    name: str = ""
    translation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    scale: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32))
    matrix: np.ndarray | None = None       # explicit local matrix, overrides TRS
    has_trs_animation: bool = False
    children: list[int] = dataclasses.field(default_factory=list)
    mesh_ids: list[int] = dataclasses.field(default_factory=list)
    skin_id: int = -1
    morph_weights: np.ndarray | None = None
    world: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))

    def local_matrix(self) -> np.ndarray:
        if self.matrix is not None and not self.has_trs_animation:
            return self.matrix
        return compose_trs(self.translation, self.rotation, self.scale)


@dataclasses.dataclass
class Skin:
    joint_nodes: list[int]
    inverse_bind: np.ndarray              # (J, 4, 4)


class SceneObject:
    """One loaded model; owns meshes, nodes, skins, animations."""

    def __init__(self, name: str = ""):
        self.name = name
        self.meshes: list[SceneMesh] = []
        self.nodes: list[SceneNode] = []
        self.roots: list[int] = []
        self.skins: list[Skin] = []
        self.animations: list[Animation] = []
        self.mesh_matrices: list[np.ndarray] = []   # world transform per mesh
        self.light_indices: list[np.ndarray] = []   # emissive tri ids per mesh
        self.current_time = -1.0

    # -- loading support -----------------------------------------------------

    def finalize(self) -> None:
        """Compute initial transforms/poses (reference object.cpp:532-536
        does scene.set_time(0) after load)."""
        if not self.nodes and self.meshes:
            # loader produced bare meshes: wrap in identity nodes
            for i in range(len(self.meshes)):
                self.nodes.append(SceneNode(mesh_ids=[i]))
                self.roots.append(i)
        self.mesh_matrices = [np.eye(4, dtype=np.float32)
                              for _ in self.meshes]
        self.set_time(0.0, force=True)

    # -- animation tick (SURVEY §3.5) ---------------------------------------

    @property
    def is_animated(self) -> bool:
        return bool(self.animations) or any(m.is_animated for m in self.meshes)

    def set_time(self, t: float, force: bool = False) -> bool:
        """Advance animations to absolute time t; returns True if geometry or
        transforms changed (SceneObject::set_time, gltf/hierarcy.cpp:11-27)."""
        if not force and (not self.animations or t == self.current_time):
            if not force:
                return False
        self.current_time = t

        # 1. sample animation channels into node TRS / morph weights
        for anim in self.animations:
            dur = anim.duration
            at = np.fmod(t, dur) if dur > 0 else 0.0
            for ch in anim.channels:
                node = self.nodes[ch.node_id]
                v = ch.sampler.sample(at)
                if ch.path == PATH_TRANSLATION:
                    node.translation = np.asarray(v, np.float32)
                    node.has_trs_animation = True
                elif ch.path == PATH_ROTATION:
                    node.rotation = np.asarray(v, np.float32)
                    node.has_trs_animation = True
                elif ch.path == PATH_SCALE:
                    node.scale = np.asarray(v, np.float32)
                    node.has_trs_animation = True
                elif ch.path == PATH_WEIGHTS:
                    node.morph_weights = np.atleast_1d(
                        np.asarray(v, np.float32))

        # 2. recompute world transforms (node.h:36-40 update recursion),
        # iteratively to dodge Python recursion limits on deep trees.
        stack = [(r, np.eye(4, dtype=np.float32)) for r in self.roots]
        node_world = [np.eye(4, dtype=np.float32)] * len(self.nodes)
        while stack:
            idx, parent = stack.pop()
            node = self.nodes[idx]
            world = parent @ node.local_matrix()
            node.world = world
            node_world[idx] = world
            for c in node.children:
                stack.append((c, world))

        # 3. assign mesh matrices + pose skinned/morphed meshes
        changed = force
        for idx, node in enumerate(self.nodes):
            for mid in node.mesh_ids:
                mesh = self.meshes[mid]
                if mesh.skin_id >= 0:
                    # skinned: vertices posed into object space, matrix = I
                    skin = self.skins[mesh.skin_id]
                    jw = np.stack([node_world[j] for j in skin.joint_nodes])
                    jmats = skinning.joint_matrices(jw, skin.inverse_bind)
                    pos, nrm = mesh.base_positions, mesh.base_normals
                    if mesh.morph_positions is not None and \
                            node.morph_weights is not None:
                        pos, nrm = skinning.apply_morphs(
                            pos, nrm, mesh.morph_positions,
                            mesh.morph_normals, node.morph_weights)
                    pos, nrm = skinning.apply_skin(
                        pos, nrm, mesh.joints, mesh.weights, jmats)
                    mesh.positions = pos
                    if nrm is not None:
                        mesh.normals = nrm
                    self.mesh_matrices[mid] = np.eye(4, dtype=np.float32)
                    mesh.invalidate()
                    changed = True
                elif mesh.morph_positions is not None and \
                        node.morph_weights is not None:
                    pos, nrm = skinning.apply_morphs(
                        mesh.base_positions, mesh.base_normals,
                        mesh.morph_positions, mesh.morph_normals,
                        node.morph_weights)
                    mesh.positions, mesh.normals = pos, (
                        nrm if nrm is not None else mesh.normals)
                    self.mesh_matrices[mid] = node.world
                    mesh.invalidate()
                    changed = True
                else:
                    prev = self.mesh_matrices[mid]
                    self.mesh_matrices[mid] = node.world
                    if force or not np.allclose(prev, node.world):
                        changed = True
        return changed

    # -- light extraction support (system.cpp:525-537) -----------------------

    def compute_light_indices(self, emissive_mats: np.ndarray) -> None:
        """Per mesh, indices of triangles whose material is emissive."""
        self.light_indices = []
        for mesh in self.meshes:
            tris = mesh.triangles()
            if len(emissive_mats) == 0:
                self.light_indices.append(np.zeros(0, np.int32))
                continue
            mats = np.clip(tris.material, 0, len(emissive_mats) - 1)
            mask = emissive_mats[mats]
            self.light_indices.append(np.nonzero(mask)[0].astype(np.int32))
