"""Versioned binary blob serialization (reference: utils/serializable.h).

Used for ``camera.bin`` persistence (reference Camera.cpp:42-72) and the skybox
decode cache (skybox.cpp:87-139). Layout: magic, version, payload-length, then a
flat little-endian struct of the registered fields.
"""

from __future__ import annotations

import struct
from typing import Any, Sequence

_MAGIC = b"RFWT"


def serialize(version: int, fields: Sequence[tuple[str, Any]]) -> bytes:
    """Pack (format-char, value) fields into a versioned blob.

    ``fields`` is a sequence of (struct format, value) pairs, e.g.
    ``[("f", 1.0), ("3f", (x, y, z)), ("i", 7)]``.
    """
    payload = b""
    for fmt, value in fields:
        if isinstance(value, (tuple, list)):
            payload += struct.pack("<" + fmt, *value)
        else:
            payload += struct.pack("<" + fmt, value)
    return _MAGIC + struct.pack("<II", version, len(payload)) + payload


def deserialize(blob: bytes, version: int, formats: Sequence[str]) -> list[Any]:
    """Unpack a blob written by :func:`serialize`; raises on magic/version mismatch."""
    if blob[:4] != _MAGIC:
        raise ValueError("bad magic in serialized blob")
    ver, length = struct.unpack("<II", blob[4:12])
    if ver != version:
        raise ValueError(f"version mismatch: got {ver}, want {version}")
    payload = blob[12:12 + length]
    out: list[Any] = []
    off = 0
    for fmt in formats:
        size = struct.calcsize("<" + fmt)
        vals = struct.unpack("<" + fmt, payload[off:off + size])
        out.append(vals[0] if len(vals) == 1 else vals)
        off += size
    return out
