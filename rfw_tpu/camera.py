"""Pinhole + thin-lens camera.

Reimplements the reference camera model
(/root/reference/RFW/system/context/rfw/context/Camera.cpp:74-115,
 camera.h:15-54): the view is parameterized by the eye position and the three
image-plane corners p1 (top-left), p2 (top-right), p3 (bottom-left), plus
aperture radius and the per-pixel solid-angle spread used for texture LOD.

``CameraView`` is a dict-of-floats pytree so it can be passed straight into
jitted render functions without recompilation when values change.
"""

from __future__ import annotations

import dataclasses
import math
import os

import numpy as np

from .utils import serial

DEFAULT_BRIGHTNESS = 0.05
DEFAULT_CONTRAST = 1.0

_SERIAL_VERSION = 1
_SERIAL_FORMATS = ["3f", "3f", "f", "f", "f", "f", "f", "f", "2i"]


@dataclasses.dataclass
class CameraView:
    """Flat POD view passed to engines (reference camera.h:15-54)."""

    pos: np.ndarray          # (3,) eye position
    p1: np.ndarray           # (3,) top-left image-plane corner
    p2: np.ndarray           # (3,) top-right
    p3: np.ndarray           # (3,) bottom-left
    aperture: float
    spread_angle: float      # FOV_rad / vertical pixel count (Camera.cpp:80)

    def as_pytree(self) -> dict:
        f32 = np.float32
        return {
            "pos": self.pos.astype(f32),
            "p1": self.p1.astype(f32),
            "p2": self.p2.astype(f32),
            "p3": self.p3.astype(f32),
            "aperture": f32(self.aperture),
            "spread_angle": f32(self.spread_angle),
        }


@dataclasses.dataclass
class Camera:
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    direction: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0, 0, 1], np.float32))
    fov: float = 40.0                 # vertical FOV in degrees
    aperture: float = 0.0
    focal_distance: float = 5.0
    brightness: float = DEFAULT_BRIGHTNESS
    contrast: float = DEFAULT_CONTRAST
    aspect_ratio: float = 1.0
    pixel_count: tuple[int, int] = (512, 512)

    # -- orientation ---------------------------------------------------------

    def calculate_matrix(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Right/up/forward basis with world-up (0,1,0) (Camera.cpp:109-115)."""
        z = self.direction / np.linalg.norm(self.direction)
        y = np.array([0.0, 1.0, 0.0], np.float32)
        x = np.cross(z, y)
        x = x / np.linalg.norm(x)
        y = np.cross(x, z)
        return x.astype(np.float32), y.astype(np.float32), z.astype(np.float32)

    def look_at(self, origin, target) -> None:
        origin = np.asarray(origin, np.float32)
        target = np.asarray(target, np.float32)
        self.position = origin
        d = target - origin
        self.direction = (d / np.linalg.norm(d)).astype(np.float32)

    def translate_relative(self, t) -> None:
        right, up, forward = self.calculate_matrix()
        t = np.asarray(t, np.float32)
        self.position = (
            self.position + t[0] * right + t[1] * up + t[2] * forward
        ).astype(np.float32)

    def translate_target(self, t) -> None:
        right, up, forward = self.calculate_matrix()
        t = np.asarray(t, np.float32)
        d = self.direction + t[0] * right + t[1] * up + t[2] * forward
        self.direction = (d / np.linalg.norm(d)).astype(np.float32)

    def resize(self, w: int, h: int) -> None:
        self.aspect_ratio = float(w) / float(h)
        self.pixel_count = (int(w), int(h))

    # -- view ----------------------------------------------------------------

    def get_view(self) -> CameraView:
        """Image-plane parametrization (Camera.cpp:74-88)."""
        right, up, forward = self.calculate_matrix()
        spread = (self.fov * math.pi / 180.0) / float(self.pixel_count[1])
        screen_size = math.tan(math.radians(self.fov) / 2.0)
        center = self.position + self.focal_distance * forward
        sr = screen_size * self.focal_distance * self.aspect_ratio * right
        su = screen_size * self.focal_distance * up
        return CameraView(
            pos=self.position.copy(),
            p1=(center - sr + su).astype(np.float32),
            p2=(center + sr + su).astype(np.float32),
            p3=(center - sr - su).astype(np.float32),
            aperture=float(self.aperture),
            spread_angle=float(spread),
        )

    # -- persistence (reference Camera.cpp:42-72) ----------------------------

    def serialize_bytes(self) -> bytes:
        return serial.serialize(_SERIAL_VERSION, [
            ("3f", tuple(float(v) for v in self.position)),
            ("3f", tuple(float(v) for v in self.direction)),
            ("f", self.fov), ("f", self.aperture), ("f", self.focal_distance),
            ("f", self.brightness), ("f", self.contrast), ("f", self.aspect_ratio),
            ("2i", self.pixel_count),
        ])

    def serialize(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.serialize_bytes())

    @staticmethod
    def deserialize_bytes(blob: bytes) -> "Camera":
        try:
            vals = serial.deserialize(blob, _SERIAL_VERSION, _SERIAL_FORMATS)
            cam = Camera()
            cam.position = np.array(vals[0], np.float32)
            cam.direction = np.array(vals[1], np.float32)
            (cam.fov, cam.aperture, cam.focal_distance, cam.brightness,
             cam.contrast, cam.aspect_ratio) = (float(v) for v in vals[2:8])
            cam.pixel_count = tuple(int(v) for v in vals[8])
            return cam
        except Exception:
            return Camera()

    @staticmethod
    def deserialize(path: str) -> "Camera":
        """Load camera state; missing/corrupt file falls back to defaults
        (reference Camera.cpp:54-61)."""
        if not os.path.exists(path):
            return Camera()
        try:
            with open(path, "rb") as f:
                return Camera.deserialize_bytes(f.read())
        except Exception:
            return Camera()
