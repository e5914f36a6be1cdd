from .mesh import TILE_AXIS, make_tile_mesh, replicated, row_sharded
from .tiles import make_tiled_renderer, render_tiled

__all__ = ["TILE_AXIS", "make_tile_mesh", "replicated", "row_sharded",
           "make_tiled_renderer", "render_tiled"]
