from .builder import BVH, build_bvh, triangle_bounds
from .tlas import BLAS, TLAS, build_blas, build_tlas, trace_tlas
from .wide import (Treelets, WideBVH, collapse_wide, extract_treelets,
                   spatial_treelets)

__all__ = ["BVH", "build_bvh", "triangle_bounds", "Treelets", "WideBVH",
           "collapse_wide", "extract_treelets", "spatial_treelets",
           "BLAS", "TLAS", "build_blas", "build_tlas", "trace_tlas"]
