from .. import _jax_setup  # noqa: F401  (compile cache)
from .context import (EngineContext, RenderSetting, RenderStats,
                      RenderStatus, available_engines, create_engine,
                      register_engine)

__all__ = ["EngineContext", "RenderSetting", "RenderStats", "RenderStatus",
           "available_engines", "create_engine", "register_engine"]
