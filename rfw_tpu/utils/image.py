"""Image IO: LDR (PNG/JPG/TGA via PIL) and HDR (Radiance RGBE, pure numpy).

Plays the role FreeImage plays in the reference (texture.cpp, skybox.cpp):
LDR images are loaded as RGBA8 and converted sRGB→linear float; HDR images
load as float32 RGB. A minimal PNG writer is used for framebuffer output.
"""

from __future__ import annotations

import numpy as np


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """sRGB → linear (reference applies pow-2.2 style conversion on LDR load)."""
    c = c.astype(np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def load_ldr(path: str, to_linear: bool = True) -> np.ndarray:
    """Load an LDR image → (H, W, 4) float32, linear RGB in [0,1], alpha as-is."""
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if to_linear:
        rgb = srgb_to_linear(arr[..., :3])
        arr = np.concatenate([rgb, arr[..., 3:4]], axis=-1)
    return arr


def load_hdr(path: str) -> np.ndarray:
    """Load a Radiance .hdr (RGBE) file → (H, W, 3) float32.

    Pure-python RGBE decoder (new-style RLE scanlines and flat files); the
    reference loads HDRs through FreeImage (skybox.cpp:87-139).
    """
    with open(path, "rb") as f:
        data = f.read()

    # Header ends at the first blank line; next line is the resolution string.
    pos = 0
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    res = data[pos:eol].split()
    pos = eol + 1
    if res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res!r}")
    height, width = int(res[1]), int(res[3])

    raw = np.frombuffer(data, dtype=np.uint8, offset=pos)
    rgbe = np.empty((height, width, 4), dtype=np.uint8)
    off = 0
    for y in range(height):
        if (
            off + 4 <= raw.size
            and raw[off] == 2 and raw[off + 1] == 2
            and (int(raw[off + 2]) << 8 | int(raw[off + 3])) == width
        ):
            off += 4  # new-style RLE: 4 component planes, each RLE-coded
            for c in range(4):
                x = 0
                while x < width:
                    count = int(raw[off]); off += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = raw[off]
                        off += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x:x + count, c] = raw[off:off + count]
                        off += count
                        x += count
        else:  # flat scanline
            n = width * 4
            rgbe[y] = raw[off:off + n].reshape(width, 4)
            off += n

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136)).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def save_hdr(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) float32 → flat (non-RLE) Radiance .hdr."""
    img = np.asarray(img, dtype=np.float32)
    h, w, _ = img.shape
    maxc = img.max(axis=-1)
    exp = np.zeros((h, w), dtype=np.int32)
    mant = np.zeros_like(maxc)
    nz = maxc > 1e-32
    mant[nz], exp[nz] = np.frexp(maxc[nz])
    scale = np.where(nz, mant * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, exp + 128, 0).astype(np.uint8)
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    with open(path, "wb") as f:
        f.write(header)
        f.write(rgbe.tobytes())


def save_png(path: str, img: np.ndarray, to_srgb: bool = True) -> None:
    """Write (H, W, 3|4) float (linear, [0,1]) or uint8 image to PNG."""
    from PIL import Image

    img = np.asarray(img)
    if img.dtype != np.uint8:
        rgb = linear_to_srgb(img[..., :3]) if to_srgb else np.clip(img[..., :3], 0, 1)
        if img.shape[-1] == 4:
            img = np.concatenate([rgb, np.clip(img[..., 3:4], 0, 1)], axis=-1)
        else:
            img = rgb
        img = (img * 255.0 + 0.5).astype(np.uint8)
    # explicit format: `path` may be a file-like object (the live viewer
    # streams PNGs from memory)
    Image.fromarray(img).save(path, format="PNG")
