"""PLY loader (ascii + binary little/big endian) → SceneObject.

Part of the Assimp-format-breadth parity (the reference loads any Assimp
format — assimp/object.cpp:88-91; PLY is a common scan/DCC interchange).
Supports vertex properties x/y/z, nx/ny/nz, u/v (or s/t), red/green/blue,
and triangulated/fanned face lists.
"""

from __future__ import annotations

import numpy as np

from .materials import HostMaterial, MaterialList
from .mesh import SceneMesh
from .object import SceneObject

_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def load_ply(path: str, materials: MaterialList,
             material_override: int = -1) -> SceneObject:
    with open(path, "rb") as f:
        data = f.read()

    # ---- header ----
    if not data.startswith(b"ply"):
        raise ValueError(f"{path}: not a PLY file")
    try:
        end = data.index(b"end_header\n") + len(b"end_header\n")
    except ValueError:
        raise ValueError(f"{path}: PLY header without end_header") from None
    header = data[:end].decode("ascii", errors="replace").splitlines()
    if not header or header[0].strip() != "ply":
        raise ValueError(f"{path}: not a PLY file")
    fmt = None
    elements: list[tuple[str, int, list]] = []   # (name, count, props)
    for line in header[1:]:
        parts = line.strip().split()
        if not parts or parts[0] == "comment":
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
            else:
                elements[-1][2].append(("scalar", parts[1], parts[2]))
    if fmt is None:
        raise ValueError(f"{path}: PLY without format line")

    body = data[end:]
    vertices = {}
    faces: list[list[int]] = []

    if fmt == "ascii":
        tokens = body.split()
        pos = 0
        for name, count, props in elements:
            if name == "vertex":
                names = [p[2] for p in props if p[0] == "scalar"]
                width = len(names)
                arr = np.array(tokens[pos:pos + count * width],
                               dtype=np.float64).reshape(count, width)
                pos += count * width
                vertices = {n: arr[:, i] for i, n in enumerate(names)}
            elif name == "face":
                for _ in range(count):
                    n = int(tokens[pos]); pos += 1
                    faces.append([int(t) for t in tokens[pos:pos + n]])
                    pos += n
            else:  # skip unknown ascii element
                width = len(props)
                pos += count * width
    elif fmt in ("binary_little_endian", "binary_big_endian"):
        bo = "<" if fmt == "binary_little_endian" else ">"
        off = 0
        for name, count, props in elements:
            if name == "vertex" and all(p[0] == "scalar" for p in props):
                dt = np.dtype([(p[2], bo + _DTYPES[p[1]]) for p in props])
                arr = np.frombuffer(body, dtype=dt, count=count, offset=off)
                off += dt.itemsize * count
                vertices = {n: arr[n].astype(np.float64)
                            for n in arr.dtype.names}
            elif name == "face":
                # assume one list property (vertex_indices)
                lp = next(p for p in props if p[0] == "list")
                cnt_dt = np.dtype(bo + _DTYPES[lp[1]])
                idx_dt = np.dtype(bo + _DTYPES[lp[2]])
                for _ in range(count):
                    n = int(np.frombuffer(body, cnt_dt, 1, off)[0])
                    off += cnt_dt.itemsize
                    idx = np.frombuffer(body, idx_dt, n, off)
                    off += idx_dt.itemsize * n
                    faces.append([int(i) for i in idx])
            else:
                scalars = [p for p in props if p[0] == "scalar"]
                if len(scalars) == len(props):
                    dt = np.dtype([(p[2], bo + _DTYPES[p[1]])
                                   for p in props])
                    off += dt.itemsize * count
                else:
                    raise ValueError(
                        f"{path}: unsupported list property in element "
                        f"{name!r}")
    else:
        raise ValueError(f"{path}: unsupported PLY format {fmt!r}")

    if not vertices or "x" not in vertices:
        raise ValueError(f"{path}: PLY without vertex positions")

    positions = np.stack([vertices["x"], vertices["y"], vertices["z"]],
                         axis=-1).astype(np.float32)
    normals = None
    if all(k in vertices for k in ("nx", "ny", "nz")):
        normals = np.stack([vertices["nx"], vertices["ny"],
                            vertices["nz"]], axis=-1).astype(np.float32)
    uv = None
    for ku, kv in (("u", "v"), ("s", "t")):
        if ku in vertices and kv in vertices:
            uv = np.stack([vertices[ku], vertices[kv]],
                          axis=-1).astype(np.float32)
            break

    tris = []
    for face in faces:
        for i in range(1, len(face) - 1):   # fan triangulation
            tris.append((face[0], face[i], face[i + 1]))
    indices = np.asarray(tris, np.int32).reshape(-1, 3)

    if material_override >= 0:
        mat = material_override
    else:
        hm = HostMaterial(name=f"{path}:default", roughness=1.0)
        if all(k in vertices for k in ("red", "green", "blue")):
            hm.color = (np.array([vertices["red"].mean(),
                                  vertices["green"].mean(),
                                  vertices["blue"].mean()], np.float32)
                        / 255.0)
        mat = materials.add(hm)

    if normals is None:
        from .obj import _smooth_normals
        normals = _smooth_normals(positions, indices)

    obj = SceneObject(name=path.rsplit("/", 1)[-1])
    obj.meshes.append(SceneMesh(positions=positions, indices=indices,
                                normals=normals, uv=uv, material_ids=mat))
    obj.finalize()
    return obj
