from . import intersect, raygen, rng, tonemap

__all__ = ["intersect", "raygen", "rng", "tonemap"]
