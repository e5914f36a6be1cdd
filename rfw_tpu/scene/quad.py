"""Two-triangle quad generator (reference geometry/quad.{h,cpp}, used by
system::add_quad — system.cpp:556-597 — mostly for area lights)."""

from __future__ import annotations

import numpy as np

from .mesh import SceneMesh


def make_quad(normal, position, width: float, height: float,
              material_id: int = 0) -> SceneMesh:
    """Quad centered at ``position`` facing ``normal`` (quad.cpp).

    The quad's tangent frame is built from the world axis least aligned with
    the normal; winding is chosen so the geometric normal equals ``normal``.
    """
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    pos = np.asarray(position, np.float64)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(n, up)) > 0.99:
        up = np.array([1.0, 0.0, 0.0])
    t = np.cross(up, n)
    t = t / np.linalg.norm(t)
    b = np.cross(n, t)
    hw, hh = width * 0.5, height * 0.5
    corners = np.stack([
        pos - hw * t - hh * b,
        pos + hw * t - hh * b,
        pos + hw * t + hh * b,
        pos - hw * t + hh * b,
    ]).astype(np.float32)
    indices = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    # verify winding produces the requested normal; flip if not
    e1 = corners[2] - corners[0]
    e2 = corners[1] - corners[0]
    if np.dot(np.cross(e1, e2), n) < 0:
        indices = indices[:, ::-1].copy()
    normals = np.repeat(n[None, :].astype(np.float32), 4, axis=0)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return SceneMesh(positions=corners, indices=indices, normals=normals,
                     uv=uv, material_ids=material_id)
