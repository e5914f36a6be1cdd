"""Equirectangular environment map + importance sampling.

Reimplements the reference skybox (skybox.{h,cpp}): HDR equirect load, the
procedural test sky (skybox.cpp:31-52), and the lat-long lookup used on ray
miss (Kernels.cu:593-601, Debevec mapping):

    u = w * 0.5 * (1 + atan2(D.x, -D.z) / pi)
    v = h * acos(D.y) / pi

The reference *declares* CDF/PDF fields for importance sampling but never
fills them (skybox.h:37-39 — dead code); here the marginal/conditional CDF
tables are actually built, completing that feature (BASELINE config 3).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..utils import image as image_io

_CACHE_MAGIC = b"RFWSKY01"


def _cache_path(src: str) -> str:
    """Decoded-pixels cache location: next to the source like the
    reference (skybox.cpp:87-139 writes `<file>.bin`), falling back to
    ~/.cache/rfw_tpu when the source directory is read-only (the
    reference assumes writable asset dirs; a served deployment can't)."""
    sidecar = src + ".bin"
    if os.access(os.path.dirname(os.path.abspath(src)) or ".", os.W_OK):
        return sidecar
    root = os.path.join(os.path.expanduser("~"), ".cache", "rfw_tpu",
                        "skybox")
    os.makedirs(root, exist_ok=True)
    key = abs(hash(os.path.abspath(src))) & 0xFFFFFFFFFFFF
    return os.path.join(root, f"{os.path.basename(src)}.{key:012x}.bin")


def _cache_load(src: str) -> np.ndarray | None:
    path = _cache_path(src)
    try:
        if os.path.getmtime(path) < os.path.getmtime(src):
            return None   # stale: source newer than cache
        with open(path, "rb") as f:
            if f.read(8) != _CACHE_MAGIC:
                return None
            h, w = struct.unpack("<II", f.read(8))
            data = np.fromfile(f, dtype=np.float32, count=h * w * 3)
        if data.size != h * w * 3:
            return None
        return data.reshape(h, w, 3)
    except OSError:
        return None


def _cache_store(src: str, pixels: np.ndarray) -> None:
    try:
        with open(_cache_path(src), "wb") as f:
            f.write(_CACHE_MAGIC)
            f.write(struct.pack("<II", pixels.shape[0], pixels.shape[1]))
            pixels.astype(np.float32).tofile(f)
    except OSError:
        pass   # cache is best-effort


class Skybox:
    def __init__(self, pixels: np.ndarray):
        """pixels: (H, W, 3) float32 linear radiance."""
        self.pixels = np.ascontiguousarray(pixels, dtype=np.float32)

    @property
    def width(self) -> int:
        return self.pixels.shape[1]

    @property
    def height(self) -> int:
        return self.pixels.shape[0]

    @staticmethod
    def load(path: str, use_cache: bool = True) -> "Skybox":
        """Load an HDR/LDR equirect map. Decoded pixels are cached as a
        `.bin` sidecar (reference skybox.cpp:87-139) so repeat loads skip
        the image decode."""
        p = str(path)
        if use_cache:
            cached = _cache_load(p)
            if cached is not None:
                return Skybox(cached)
        if p.lower().endswith(".hdr"):
            sky = Skybox(image_io.load_hdr(p))
        else:
            sky = Skybox(image_io.load_ldr(p, to_linear=True)[..., :3])
        if use_cache:
            _cache_store(p, sky.pixels)
        return sky

    @staticmethod
    def test_sky(width: int = 512, height: int = 256) -> "Skybox":
        """Procedural gradient sky with a sun disc (cf. skybox.cpp:31-52)."""
        v = (np.arange(height, dtype=np.float32) + 0.5) / height  # 0=up pole
        u = (np.arange(width, dtype=np.float32) + 0.5) / width
        theta = v * np.pi                       # polar angle from +Y
        phi = (u * 2.0 - 1.0) * np.pi
        dy = np.cos(theta)[:, None]
        horiz = np.sin(theta)[:, None]
        dx = horiz * np.sin(phi)[None, :]
        dz = -horiz * np.cos(phi)[None, :]
        # gradient: zenith blue → horizon white → mild ground
        t = np.clip(dy, 0.0, 1.0)
        sky = (np.stack([0.35 + 0.1 * (1 - t), 0.5 + 0.2 * (1 - t),
                         0.9 - 0.1 * (1 - t)], axis=-1))
        ground = np.broadcast_to(
            np.array([0.25, 0.22, 0.2], np.float32), sky.shape)
        img = np.where(dy[..., None] >= 0, sky, ground).astype(np.float32)
        # sun disc
        sun_dir = np.array([0.4, 0.6, 0.5])
        sun_dir = sun_dir / np.linalg.norm(sun_dir)
        cosang = dx * sun_dir[0] + dy * sun_dir[1] + dz * sun_dir[2]
        img = img + np.where(cosang > 0.9995, 50.0, 0.0)[..., None]
        return Skybox(img.astype(np.float32))

    def as_device(self) -> dict[str, np.ndarray]:
        return {
            "pixels": self.pixels,
            "size": np.array([self.width, self.height], np.int32),
        }

    def build_importance_tables(self) -> dict[str, np.ndarray]:
        """Luminance-weighted flat CDF with the sin(theta) solid-angle
        factor; used by envmap NEE (BASELINE config 3). One flat CDF over
        all texels keeps per-ray sampling to a single vectorized
        searchsorted — a 2-level (marginal/conditional) scheme would need a
        per-ray row gather of the full conditional table.
        """
        lum = (self.pixels * np.array([0.2126, 0.7152, 0.0722],
                                      np.float32)).sum(-1)
        h, w = lum.shape
        sin_theta = np.sin((np.arange(h, dtype=np.float32) + 0.5) / h * np.pi)
        weighted = (lum * sin_theta[:, None]).astype(np.float64) + 1e-12
        flat = weighted.reshape(-1)
        cdf = np.cumsum(flat)
        total = cdf[-1]
        flat_cdf = (cdf / total).astype(np.float32)
        # pdf over solid angle: texel covers dω = (2π/w)(π/h) sinθ
        pdf = (weighted / total * (w * h) /
               (2.0 * np.pi * np.pi * np.maximum(
                   sin_theta[:, None], 1e-6))).astype(np.float32)
        return {"flat_cdf": flat_cdf, "pdf": pdf}
