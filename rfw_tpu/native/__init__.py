"""Native (C++) components, loaded via ctypes with graceful fallback.

The reference delegates BVH construction to a native Rust crate over FFI
(/root/reference/RFW/system/bvh/CMakeLists.txt:12-47); here the native
builder is C++17 (bvh_builder.cpp), compiled by ``python -m
rfw_tpu.native.build`` (or make) into ``librfw_bvh.so`` next to this file.
When the library is absent every entry point returns None and callers fall
back to the vectorized numpy implementation.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "librfw_bvh.so")
    src = os.path.join(os.path.dirname(__file__), "bvh_builder.cpp")
    if (os.path.exists(path) and os.path.exists(src)
            and os.path.getmtime(path) < os.path.getmtime(src)):
        # stale build artifact (source changed since compile): rebuild so
        # newly added C symbols resolve
        try:
            os.remove(path)
        except OSError:
            pass
    if not os.path.exists(path):
        # best-effort first-use compile (the .so is a build artifact, not
        # checked in; g++ is a baseline dependency of this image)
        try:
            import subprocess
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffast-math", "-fPIC",
                 "-std=c++17", "-shared", "-o", path,
                 os.path.join(os.path.dirname(__file__),
                              "bvh_builder.cpp")],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.rfw_build_bvh.restype = ctypes.c_int
        lib.rfw_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # tri_min (T*3)
            ctypes.POINTER(ctypes.c_float),   # tri_max (T*3)
            ctypes.c_int,                     # T
            ctypes.c_int,                     # leaf_size
            ctypes.POINTER(ctypes.c_float),   # out bmin (2T*3)
            ctypes.POINTER(ctypes.c_float),   # out bmax
            ctypes.POINTER(ctypes.c_int),     # out child
            ctypes.POINTER(ctypes.c_int),     # out count
            ctypes.POINTER(ctypes.c_int),     # out depth
            ctypes.POINTER(ctypes.c_int),     # out prim_order (T)
        ]
        lib.rfw_build_bvh_loc.restype = ctypes.c_int
        lib.rfw_build_bvh_loc.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # tri_min (T*3)
            ctypes.POINTER(ctypes.c_float),   # tri_max (T*3)
            ctypes.c_int,                     # T
            ctypes.c_int,                     # leaf_size
            ctypes.c_int,                     # search_radius
            ctypes.POINTER(ctypes.c_float),   # out bmin (2T*3)
            ctypes.POINTER(ctypes.c_float),   # out bmax
            ctypes.POINTER(ctypes.c_int),     # out child
            ctypes.POINTER(ctypes.c_int),     # out count
            ctypes.POINTER(ctypes.c_int),     # out depth
            ctypes.POINTER(ctypes.c_int),     # out prim_order (T)
        ]
        lib.rfw_spatial_treelets.restype = ctypes.c_int
        lib.rfw_spatial_treelets.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # tri_min (T*3)
            ctypes.POINTER(ctypes.c_float),   # tri_max (T*3)
            ctypes.c_int,                     # T
            ctypes.c_int,                     # size
            ctypes.POINTER(ctypes.c_int),     # out count (C,)
            ctypes.POINTER(ctypes.c_int),     # out order (T,)
            ctypes.POINTER(ctypes.c_float),   # out bmin (C, 3)
            ctypes.POINTER(ctypes.c_float),   # out bmax (C, 3)
        ]
        lib.rfw_collapse_wide.restype = ctypes.c_int
        lib.rfw_collapse_wide.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rfw_extract_treelets.restype = ctypes.c_int
        lib.rfw_extract_treelets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.rfw_refit_bvh.restype = None
        lib.rfw_refit_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    except (OSError, AttributeError):
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def native_build_bvh(tri_min: np.ndarray, tri_max: np.ndarray,
                     leaf_size: int):
    """C++ binned-SAH build; returns BVH field tuple or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = int(tri_min.shape[0])
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    cap = max(2 * t, 16)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    child = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    depth = np.empty(cap, np.int32)
    order = np.empty(max(t, 1), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n = lib.rfw_build_bvh(
        tri_min.ctypes.data_as(fp), tri_max.ctypes.data_as(fp),
        t, int(leaf_size),
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        child.ctypes.data_as(ip), count.ctypes.data_as(ip),
        depth.ctypes.data_as(ip), order.ctypes.data_as(ip))
    if n <= 0:
        return None
    return (bmin[:n].copy(), bmax[:n].copy(), child[:n].copy(),
            count[:n].copy(), order, depth[:n].copy())


def native_spatial_treelets(tri_min: np.ndarray, tri_max: np.ndarray,
                            size: int):
    """C++ centroid-median kd cut into disjoint <=size cells (the
    flagship intersector's cell builder — see bvh/wide.spatial_treelets).
    Returns (count (C,), order (T,), bmin (C,3), bmax (C,3)) or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "rfw_spatial_treelets"):
        return None
    t = int(tri_min.shape[0])
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    cap = max(-(-t // max(size, 1)) * 2 + 8, 16)
    count = np.empty(cap, np.int32)
    order = np.empty(max(t, 1), np.int32)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n = lib.rfw_spatial_treelets(
        tri_min.ctypes.data_as(fp), tri_max.ctypes.data_as(fp),
        t, int(size),
        count.ctypes.data_as(ip), order.ctypes.data_as(ip),
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp))
    if n <= 0:
        return None
    return (count[:n].copy(), order, bmin[:n].copy(), bmax[:n].copy())


def native_build_bvh_loc(tri_min: np.ndarray, tri_max: np.ndarray,
                         leaf_size: int, search_radius: int = 16):
    """C++ locally-ordered-clustering build (PLOC) — the reference rtbvh
    crate's second build mode (BvhType::LocallyOrderedClustering,
    consumed at bvh_tree.cpp:74-101). Same output layout as
    ``native_build_bvh``; None if the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "rfw_build_bvh_loc"):
        return None
    t = int(tri_min.shape[0])
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    cap = max(2 * t, 16)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    child = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    depth = np.empty(cap, np.int32)
    order = np.empty(max(t, 1), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n = lib.rfw_build_bvh_loc(
        tri_min.ctypes.data_as(fp), tri_max.ctypes.data_as(fp),
        t, int(leaf_size), int(search_radius),
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        child.ctypes.data_as(ip), count.ctypes.data_as(ip),
        depth.ctypes.data_as(ip), order.ctypes.data_as(ip))
    if n <= 0:
        return None
    return (bmin[:n].copy(), bmax[:n].copy(), child[:n].copy(),
            count[:n].copy(), order, depth[:n].copy())


def native_refit_bvh(bvh, tri_min: np.ndarray, tri_max: np.ndarray):
    """In-place bottom-up refit of a builder BVH; returns False if the native
    library is unavailable (callers use the numpy/jax refit instead)."""
    lib = _load()
    if lib is None:
        return False
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    assert bvh.bmin.flags.c_contiguous and bvh.bmax.flags.c_contiguous
    lib.rfw_refit_bvh(
        bvh.bmin.ctypes.data_as(fp), bvh.bmax.ctypes.data_as(fp),
        bvh.child.ctypes.data_as(ip), bvh.count.ctypes.data_as(ip),
        bvh.node_count,
        tri_min.ctypes.data_as(fp), tri_max.ctypes.data_as(fp),
        bvh.prim_order.ctypes.data_as(ip))
    return True


def native_collapse_wide(bvh, width: int):
    """C++ wide collapse; returns WideBVH field tuple or None."""
    lib = _load()
    if lib is None:
        return None
    n = bvh.node_count
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    out_bmin = np.zeros((n, width, 3), np.float32)
    out_bmax = np.zeros((n, width, 3), np.float32)
    out_child = np.full((n, width), -1, np.int32)
    out_count = np.full((n, width), -1, np.int32)
    bmin = np.ascontiguousarray(bvh.bmin, np.float32)
    bmax = np.ascontiguousarray(bvh.bmax, np.float32)
    child = np.ascontiguousarray(bvh.child, np.int32)
    count = np.ascontiguousarray(bvh.count, np.int32)
    nw = lib.rfw_collapse_wide(
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        child.ctypes.data_as(ip), count.ctypes.data_as(ip), n, width,
        out_bmin.ctypes.data_as(fp), out_bmax.ctypes.data_as(fp),
        out_child.ctypes.data_as(ip), out_count.ctypes.data_as(ip))
    if nw <= 0:
        return None
    return (out_bmin[:nw].copy(), out_bmax[:nw].copy(),
            out_child[:nw].copy(), out_count[:nw].copy())


def native_extract_treelets(bvh, size: int):
    """C++ treelet cut; returns (first, count, bmin, bmax) or None."""
    lib = _load()
    if lib is None:
        return None
    n = bvh.node_count
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    cap = max(n, 1)
    out_first = np.zeros(cap, np.int32)
    out_count = np.zeros(cap, np.int32)
    out_bmin = np.zeros((cap, 3), np.float32)
    out_bmax = np.zeros((cap, 3), np.float32)
    bmin = np.ascontiguousarray(bvh.bmin, np.float32)
    bmax = np.ascontiguousarray(bvh.bmax, np.float32)
    child = np.ascontiguousarray(bvh.child, np.int32)
    count = np.ascontiguousarray(bvh.count, np.int32)
    nt = lib.rfw_extract_treelets(
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        child.ctypes.data_as(ip), count.ctypes.data_as(ip), n, size,
        out_first.ctypes.data_as(ip), out_count.ctypes.data_as(ip),
        out_bmin.ctypes.data_as(fp), out_bmax.ctypes.data_as(fp))
    if nt <= 0:
        return None
    return (out_first[:nt].copy(), out_count[:nt].copy(),
            out_bmin[:nt].copy(), out_bmax[:nt].copy())
