"""Textures: load, mip chain, and the flat HBM atlas.

Reimplements the reference texture pipeline (texture.cpp): LDR images become
linear-RGBA float with a 5-level box-filtered mip chain (MIPLEVELCOUNT,
settings.h:3, texture.cpp:94,137); HDR images are float and unmipped
(texture.cpp:96-113). Like the CUDA backend — which flattens every texture
into one big device array (CUDART/src/Context.cpp:201-268) — all textures and
their mips are packed into a single (N, 4) float32 atlas; shading gathers rows
by computed address. One flat array + row gathers is the TPU-friendly layout.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils import image

MIP_LEVEL_COUNT = 5


@dataclasses.dataclass
class Texture:
    """Decoded texture with mip chain; mips[0] is the base level."""

    mips: list[np.ndarray]        # each (H, W, 4) float32 linear
    is_hdr: bool = False

    @property
    def width(self) -> int:
        return self.mips[0].shape[1]

    @property
    def height(self) -> int:
        return self.mips[0].shape[0]

    @staticmethod
    def load(path: str) -> "Texture":
        p = str(path)
        if p.lower().endswith(".hdr"):
            rgb = image.load_hdr(p)
            rgba = np.concatenate(
                [rgb, np.ones_like(rgb[..., :1])], axis=-1).astype(np.float32)
            return Texture(mips=[rgba], is_hdr=True)
        base = image.load_ldr(p, to_linear=True)
        return Texture.from_array(base, is_hdr=False)

    @staticmethod
    def from_array(base: np.ndarray, is_hdr: bool = False) -> "Texture":
        base = np.asarray(base, np.float32)
        if base.ndim == 2:
            base = base[..., None].repeat(3, axis=-1)
        if base.shape[-1] == 3:
            base = np.concatenate(
                [base, np.ones_like(base[..., :1])], axis=-1)
        mips = [base]
        if not is_hdr:
            for _ in range(MIP_LEVEL_COUNT - 1):
                mips.append(_downsample2x(mips[-1]))
        return Texture(mips=mips, is_hdr=is_hdr)


def _downsample2x(img: np.ndarray) -> np.ndarray:
    """2x box filter with edge clamp for odd sizes (texture.cpp mip build)."""
    h, w, c = img.shape
    if h <= 1 and w <= 1:
        return img.copy()
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    ph, pw = h2 * 2, w2 * 2
    padded = img
    if ph != h or pw != w:
        padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    return padded.reshape(h2, 2, w2, 2, c).mean(axis=(1, 3)).astype(np.float32)


def build_texture_atlas(textures: list[Texture]) -> dict[str, np.ndarray]:
    """Pack all textures' mip chains into one flat (N, 4) array.

    Returns {"atlas": (N,4) f32, "desc": (T, MIP_LEVEL_COUNT, 3) i32} where
    desc[t, l] = (addr, width, height); unmipped textures repeat level 0 so
    LOD lookups need no branching. With no textures, a 1-texel white atlas is
    emitted so jitted code has a valid array to gather from.
    """
    if not textures:
        atlas = np.ones((1, 4), np.float32)
        desc = np.zeros((1, MIP_LEVEL_COUNT, 3), np.int32)
        desc[0, :, 1:] = 1
        return {"atlas": atlas, "desc": desc}

    chunks: list[np.ndarray] = []
    desc = np.zeros((len(textures), MIP_LEVEL_COUNT, 3), np.int32)
    addr = 0
    for t, tex in enumerate(textures):
        for level in range(MIP_LEVEL_COUNT):
            mip = tex.mips[min(level, len(tex.mips) - 1)]
            h, w, _ = mip.shape
            if level < len(tex.mips):
                chunks.append(mip.reshape(-1, 4))
                desc[t, level] = (addr, w, h)
                addr += w * h
            else:  # reuse the last real mip's storage
                desc[t, level] = desc[t, len(tex.mips) - 1]
    atlas = np.concatenate(chunks, axis=0).astype(np.float32)
    return {"atlas": atlas, "desc": desc}
