"""glTF animation channels and samplers.

Mirrors SceneAnimation::{Sampler, Channel}
(/root/reference/RFW/system/src/rfw/geometry/gltf/animation.h:12-64):
per-channel keyframed translation/rotation/scale/weights with STEP, LINEAR
and CUBICSPLINE interpolation; rotations slerp via normalized lerp as the
reference does (quaternion mix).
"""

from __future__ import annotations

import dataclasses

import numpy as np

STEP = "STEP"
LINEAR = "LINEAR"
CUBICSPLINE = "CUBICSPLINE"

PATH_TRANSLATION = "translation"
PATH_ROTATION = "rotation"
PATH_SCALE = "scale"
PATH_WEIGHTS = "weights"


@dataclasses.dataclass
class Sampler:
    times: np.ndarray          # (K,) float32, ascending
    values: np.ndarray         # (K, D) or (K, 3, D) for CUBICSPLINE
    interpolation: str = LINEAR

    def sample(self, t: float) -> np.ndarray:
        """Evaluate at time t (clamped), per glTF 2.0 semantics
        (animation.h sampleFromSamplers)."""
        times = self.times
        k = int(np.searchsorted(times, t, side="right") - 1)
        if k < 0:
            v = self.values[0]
            return v[1] if self.interpolation == CUBICSPLINE else v
        if k >= len(times) - 1:
            v = self.values[-1]
            return v[1] if self.interpolation == CUBICSPLINE else v
        t0, t1 = float(times[k]), float(times[k + 1])
        dt = max(t1 - t0, 1e-9)
        f = (t - t0) / dt
        if self.interpolation == STEP:
            return self.values[k]
        if self.interpolation == CUBICSPLINE:
            # values[k] = (in_tangent, value, out_tangent)
            p0, m0 = self.values[k][1], self.values[k][2] * dt
            p1, m1 = self.values[k + 1][1], self.values[k + 1][0] * dt
            f2, f3 = f * f, f * f * f
            return ((2 * f3 - 3 * f2 + 1) * p0 + (f3 - 2 * f2 + f) * m0
                    + (-2 * f3 + 3 * f2) * p1 + (f3 - f2) * m1)
        # LINEAR
        v0, v1 = self.values[k], self.values[k + 1]
        return (1.0 - f) * v0 + f * v1


@dataclasses.dataclass
class Channel:
    node_id: int
    path: str                  # translation | rotation | scale | weights
    sampler: Sampler


@dataclasses.dataclass
class Animation:
    name: str
    channels: list[Channel]

    @property
    def duration(self) -> float:
        return max((float(c.sampler.times[-1]) for c in self.channels),
                   default=0.0)


def quat_normalize(q: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(q)
    return q / n if n > 0 else np.array([0, 0, 0, 1], np.float32)


def quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """glTF (x, y, z, w) quaternion → 3x3 rotation matrix."""
    x, y, z, w = (float(v) for v in quat_normalize(np.asarray(q, np.float64)))
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)


def compose_trs(translation, rotation, scale) -> np.ndarray:
    """TRS → 4x4 (column-vector convention, world = M @ local)."""
    m = np.eye(4, dtype=np.float32)
    r = quat_to_matrix(rotation) * np.asarray(scale, np.float32)[None, :]
    m[:3, :3] = r
    m[:3, 3] = np.asarray(translation, np.float32)
    return m
