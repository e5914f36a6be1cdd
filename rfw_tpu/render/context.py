"""Engine ABI — the stable contract between the render system and engines.

Python mirror of the reference's RenderContext
(/root/reference/RFW/system/context/rfw/context/context.h:74-111): 14-method
surface (mesh/instance/material/texture/light/sky upload, render_frame,
probe, settings, stats), the RenderStatus reset/converge protocol (:19-23),
RenderStats (:50-72) and the enumerable runtime-settings protocol (:36-48).

Engines register under a name (the analog of backend shared-library names in
system::load_render_api, system.cpp:107-158); ``create_engine`` is the
dlopen/createRenderContext replacement.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from ..config import RenderConfig
from ..utils import Averager


class RenderStatus(enum.Enum):
    """context.h:19-23."""

    RESET = 0      # camera/scene changed: clear accumulator
    CONVERGE = 1   # keep accumulating


@dataclasses.dataclass
class RenderStats:
    """Per-frame stage stats (context.h:50-72)."""

    primary_count: int = 0
    secondary_count: int = 0
    deep_count: int = 0
    shadow_count: int = 0
    primary_time: float = 0.0
    secondary_time: float = 0.0
    deep_time: float = 0.0
    shadow_time: float = 0.0
    shade_time: float = 0.0
    finalize_time: float = 0.0
    animation_time: float = 0.0
    render_time: float = 0.0

    def clear(self) -> None:
        for f in dataclasses.fields(self):
            setattr(self, f.name, type(getattr(self, f.name))())

    def mrays_per_s(self) -> float:
        rays = (self.primary_count + self.secondary_count + self.deep_count
                + self.shadow_count)
        return rays / max(self.render_time, 1e-9) / 1e6


@dataclasses.dataclass
class RenderSetting:
    """One enumerable runtime setting (context.h:36-48)."""

    name: str
    value: str
    options: list[str]


class EngineContext:
    """Abstract engine. Subclasses implement the upload + render surface."""

    def __init__(self, config: RenderConfig | None = None):
        self.config = config or RenderConfig()
        self.stats = RenderStats()
        self._stat_averagers: dict[str, Averager] = {}
        self._finished_frame = None

    # -- geometry / scene upload (context.h:93-103) --------------------------

    def set_mesh(self, slot: int, triangles) -> None:
        raise NotImplementedError

    def set_instance(self, instance_id: int, mesh_slot: int,
                     transform: np.ndarray) -> None:
        raise NotImplementedError

    def remove_instance(self, instance_id: int) -> None:
        raise NotImplementedError

    def set_materials(self, device_materials: dict[str, np.ndarray]) -> None:
        raise NotImplementedError

    def set_textures(self, atlas: dict[str, np.ndarray]) -> None:
        raise NotImplementedError

    def set_lights(self, lights: dict[str, np.ndarray],
                   overrides=None) -> None:
        raise NotImplementedError

    def set_sky(self, pixels: np.ndarray) -> None:
        raise NotImplementedError

    def update(self) -> None:
        """Commit pending scene changes (BVH rebuild/refit; context.h update)."""
        raise NotImplementedError

    # -- frame (context.h:95) ------------------------------------------------

    def render_frame(self, view, status: RenderStatus) -> np.ndarray:
        """Trace/raster one frame; returns the resolved HDR framebuffer
        (H, W, 3). Progressive engines accumulate until RESET."""
        raise NotImplementedError

    def render_frame_async(self, view, status: RenderStatus,
                           samples: int = 1) -> None:
        """Dispatch a frame without waiting; ``finish_frame()`` collects
        it. Default: render synchronously and stash (engines without an
        async device path keep the ABI). PathTracerEngine overrides with
        a true XLA async dispatch — the reference's thread-pool overlap
        analog (system.cpp:438-458)."""
        self._finished_frame = self.render_frame(view, status,
                                                 samples=samples)

    def finish_frame(self) -> np.ndarray:
        frame = self._finished_frame
        self._finished_frame = None
        return frame

    # -- probe (context.h:104-105) -------------------------------------------

    def set_probe_index(self, pixel_xy: tuple[int, int]) -> None:
        self._probe_xy = tuple(pixel_xy)

    def get_probe_results(self) -> tuple[int, int, float]:
        """(instance_id, prim_id, distance) under the probe pixel."""
        raise NotImplementedError

    # -- settings (context.h:36-48, 106-107) ---------------------------------

    def get_available_settings(self) -> list[RenderSetting]:
        return []

    def set_setting(self, name: str, value: str) -> None:
        known = {s.name for s in self.get_available_settings()}
        if name not in known:
            raise KeyError(f"unknown setting {name!r}; available: {known}")

    # -- validation (reference m_Context->validate(),
    #    OptiXContext.cpp:369-378) ----------------------------------------

    def validate(self) -> None:
        """Check engine/scene invariants; raises on inconsistency."""

    # -- stats ---------------------------------------------------------------

    def get_stats(self) -> RenderStats:
        return self.stats

    def smoothed(self, name: str, value: float) -> float:
        """32-sample ring-buffer smoothing (system.h:175-176 averager)."""
        av = self._stat_averagers.setdefault(name, Averager(32))
        av.add_sample(value)
        return av.get_average()


# -- registry (the dlopen replacement) --------------------------------------

_ENGINES: dict[str, type] = {}


def register_engine(name: str):
    def deco(cls):
        _ENGINES[name] = cls
        cls.engine_name = name
        return cls
    return deco


def available_engines() -> list[str]:
    _ensure_imported()
    return sorted(_ENGINES)


def create_engine(name: str, config: RenderConfig | None = None,
                  **kw) -> EngineContext:
    """Instantiate an engine by name, falling back to the safest engine on
    failure like the reference falls back to GLRenderer (app.cpp:61-71)."""
    _ensure_imported()
    if name not in _ENGINES:
        raise KeyError(
            f"unknown engine {name!r}; available: {available_engines()}")
    return _ENGINES[name](config=config, **kw)


def _ensure_imported() -> None:
    from . import engines as _e  # noqa: F401  (registers via decorators)
    from . import raster as _r   # noqa: F401
