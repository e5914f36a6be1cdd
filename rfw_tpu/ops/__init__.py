from .. import _jax_setup  # noqa: F401  (compile cache)
from . import intersect, raygen, rng, tonemap

__all__ = ["intersect", "raygen", "rng", "tonemap"]
