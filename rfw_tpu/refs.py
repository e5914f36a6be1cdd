"""Lightweight scene handles (reference instance_ref.h:13-60,
geometry_ref.{h,cpp}, light_ref.h:10-36): thin views into RenderSystem state
whose setters mark the right dirty bits."""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from .system import RenderSystem


def _rotation_matrix(axis, angle_deg: float) -> np.ndarray:
    a = np.asarray(axis, np.float64)
    n = np.linalg.norm(a)
    if n < 1e-12 or angle_deg == 0.0:
        return np.eye(4, dtype=np.float32)
    a = a / n
    c = math.cos(math.radians(angle_deg))
    s = math.sin(math.radians(angle_deg))
    x, y, z = a
    r = np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ])
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    return m


class GeometryRef:
    """Handle to a loaded model (geometry_ref)."""

    def __init__(self, index: int, system: "RenderSystem"):
        self._index = index
        self._system = system

    @property
    def index(self) -> int:
        return self._index

    @property
    def object(self):
        return self._system._objects[self._index]

    @property
    def mesh_slots(self) -> list[int]:
        return [m.mesh_slot for m in self.object.meshes]

    def is_animated(self) -> bool:
        return self.object.is_animated


class InstanceRef:
    """Handle to one placed instance; TRS setters mark INSTANCES dirty
    (instance_ref.h:13-60)."""

    def __init__(self, index: int, geometry: GeometryRef,
                 system: "RenderSystem"):
        self._index = index
        self.geometry = geometry
        self._system = system
        self._translation = np.zeros(3, np.float32)
        self._scale = np.ones(3, np.float32)
        self._rotation = np.eye(4, dtype=np.float32)

    @property
    def index(self) -> int:
        return self._index

    def set_transform(self, scale=(1, 1, 1), translation=(0, 0, 0),
                      rotation_deg: float = 0.0, rotation_axis=(0, 1, 0)
                      ) -> None:
        self._scale = np.asarray(scale, np.float32)
        self._translation = np.asarray(translation, np.float32)
        self._rotation = _rotation_matrix(rotation_axis, rotation_deg)
        self._update()

    def translate(self, offset) -> None:
        self._translation = self._translation + np.asarray(offset, np.float32)
        self._update()

    def rotate(self, angle_deg: float, axis) -> None:
        self._rotation = _rotation_matrix(axis, angle_deg) @ self._rotation
        self._update()

    def scale(self, s) -> None:
        self._scale = self._scale * np.asarray(s, np.float32)
        self._update()

    @property
    def matrix(self) -> np.ndarray:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = self._translation
        s = np.diag([*self._scale.tolist(), 1.0]).astype(np.float32)
        return t @ self._rotation @ s

    def _update(self) -> None:
        self._system.update_instance(self._index, self.matrix)


class LightRef:
    """Handle to a point/spot/directional light (light_ref.h:10-36)."""

    def __init__(self, index: int, kind: str, system: "RenderSystem"):
        self._index = index
        self.kind = kind
        self._system = system

    def _store(self):
        return {
            "point": self._system._point_lights,
            "spot": self._system._spot_lights,
            "directional": self._system._dir_lights,
        }[self.kind]

    @property
    def light(self):
        return self._store()[self._index]

    def set_position(self, position) -> None:
        self.light.position = np.asarray(position, np.float32)
        self._mark()

    def set_radiance(self, radiance) -> None:
        self.light.radiance = np.asarray(radiance, np.float32)
        self._mark()

    def _mark(self) -> None:
        from .system import Changed
        self._system._changed |= Changed.LIGHTS
