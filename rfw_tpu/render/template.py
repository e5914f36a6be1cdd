"""Template engine scaffold — every ABI method stubbed.

The analog of the reference's TemplateRenderer
(/root/reference/RFW/backends/TemplateRenderer/src/Context.{h,cpp}): copy
this file, rename the class and the ``register_engine`` name, and fill in
the methods to bootstrap a new engine into the cross-engine test harness.
Not registered by default.
"""

from __future__ import annotations

import numpy as np

from ..config import RenderConfig
from .context import EngineContext, RenderStatus


class TemplateEngine(EngineContext):
    """Minimal skeleton: accepts the scene, renders black frames."""

    def __init__(self, config: RenderConfig | None = None):
        super().__init__(config)
        self._size = (0, 0)

    def set_mesh(self, slot, triangles):
        pass

    def set_instance(self, instance_id, mesh_slot, transform):
        pass

    def remove_instance(self, instance_id):
        pass

    def set_materials(self, device_materials):
        pass

    def set_textures(self, atlas):
        pass

    def set_lights(self, lights, overrides=None):
        pass

    def set_sky(self, pixels):
        pass

    def update(self):
        pass

    def resize(self, width, height):
        self._size = (width, height)

    def render_frame(self, view, status: RenderStatus = RenderStatus.RESET,
                     samples: int = 1) -> np.ndarray:
        w, h = self._size
        return np.zeros((h, w, 3), np.float32)

    def get_probe_results(self):
        return (-1, -1, -1.0)
