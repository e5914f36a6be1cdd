"""Light types + device SoA packing.

Mirrors the four host light structs (reference context/structs.h:215-255) and
their device mirrors (device_structs.h). ``energy`` is |radiance| for
point/spot/directional (system.cpp:725,742,753) and |color| for area lights
(system.cpp:1014). Device form: fixed-capacity padded SoA arrays + counts, so
jitted shading code has static shapes regardless of live light counts.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _v3(x) -> np.ndarray:
    return np.asarray(x, np.float32).reshape(3)


@dataclasses.dataclass
class PointLight:
    position: np.ndarray
    radiance: np.ndarray

    @property
    def energy(self) -> float:
        return float(np.linalg.norm(self.radiance))


@dataclasses.dataclass
class SpotLight:
    position: np.ndarray
    direction: np.ndarray
    radiance: np.ndarray
    cos_inner: float
    cos_outer: float

    @property
    def energy(self) -> float:
        return float(np.linalg.norm(self.radiance))


@dataclasses.dataclass
class DirectionalLight:
    direction: np.ndarray
    radiance: np.ndarray

    @property
    def energy(self) -> float:
        return float(np.linalg.norm(self.radiance))


@dataclasses.dataclass
class AreaLight:
    """Extracted emissive triangle in world space (structs.h:215-229)."""

    vertex0: np.ndarray
    vertex1: np.ndarray
    vertex2: np.ndarray
    normal: np.ndarray
    radiance: np.ndarray
    area: float
    tri_idx: int = -1        # triangle index within its mesh
    inst_idx: int = -1       # instance index
    mesh_idx: int = 0        # mesh index within the instance's object

    @property
    def position(self) -> np.ndarray:
        return ((self.vertex0 + self.vertex1 + self.vertex2) / 3.0).astype(
            np.float32)

    @property
    def energy(self) -> float:
        return float(np.linalg.norm(self.radiance))


def pack_lights(
    area: list[AreaLight],
    point: list[PointLight],
    spot: list[SpotLight],
    directional: list[DirectionalLight],
    capacity: int | None = None,
) -> dict[str, np.ndarray]:
    """Pack all lights into padded SoA planes + counts.

    ``capacity`` pads each light class to a static size (next power of two,
    min 1) so shading stages don't recompile when a light is added. Unused
    slots have zero energy, which makes them unpickable by the potential-based
    importance sampler (lights.h:159-265).
    """

    def cap(n: int) -> int:
        c = capacity if capacity is not None else max(1, 1 << (max(n, 1) - 1).bit_length())
        return max(c, n, 1)

    na, npt, ns, nd = len(area), len(point), len(spot), len(directional)
    ca, cp, cs, cd = cap(na), cap(npt), cap(ns), cap(nd)

    out = {
        "counts": np.array([na, npt, ns, nd], np.int32),
        # area lights
        "area_v0": np.zeros((ca, 3), np.float32),
        "area_v1": np.zeros((ca, 3), np.float32),
        "area_v2": np.zeros((ca, 3), np.float32),
        "area_normal": np.zeros((ca, 3), np.float32),
        "area_radiance": np.zeros((ca, 3), np.float32),
        "area_position": np.zeros((ca, 3), np.float32),
        "area_area": np.zeros(ca, np.float32),
        "area_energy": np.zeros(ca, np.float32),
        # point lights
        "point_position": np.zeros((cp, 3), np.float32),
        "point_radiance": np.zeros((cp, 3), np.float32),
        "point_energy": np.zeros(cp, np.float32),
        # spot lights
        "spot_position": np.zeros((cs, 3), np.float32),
        "spot_direction": np.zeros((cs, 3), np.float32),
        "spot_radiance": np.zeros((cs, 3), np.float32),
        "spot_cos_inner": np.zeros(cs, np.float32),
        "spot_cos_outer": np.zeros(cs, np.float32),
        "spot_energy": np.zeros(cs, np.float32),
        # directional lights
        "dir_direction": np.zeros((cd, 3), np.float32),
        "dir_radiance": np.zeros((cd, 3), np.float32),
        "dir_energy": np.zeros(cd, np.float32),
    }

    for i, l in enumerate(area):
        out["area_v0"][i] = _v3(l.vertex0)
        out["area_v1"][i] = _v3(l.vertex1)
        out["area_v2"][i] = _v3(l.vertex2)
        out["area_normal"][i] = _v3(l.normal)
        out["area_radiance"][i] = _v3(l.radiance)
        out["area_position"][i] = l.position
        out["area_area"][i] = l.area
        out["area_energy"][i] = l.energy
    for i, l in enumerate(point):
        out["point_position"][i] = _v3(l.position)
        out["point_radiance"][i] = _v3(l.radiance)
        out["point_energy"][i] = l.energy
    for i, l in enumerate(spot):
        out["spot_position"][i] = _v3(l.position)
        out["spot_direction"][i] = _v3(l.direction)
        out["spot_radiance"][i] = _v3(l.radiance)
        out["spot_cos_inner"][i] = l.cos_inner
        out["spot_cos_outer"][i] = l.cos_outer
        out["spot_energy"][i] = l.energy
    for i, l in enumerate(directional):
        out["dir_direction"][i] = _v3(l.direction)
        out["dir_radiance"][i] = _v3(l.radiance)
        out["dir_energy"][i] = l.energy
    return out
