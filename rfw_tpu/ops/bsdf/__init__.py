"""BSDF library (reference bsdf/ directory: disney active, lambert and
microfacet as alternatives — bsdf/bsdf.h:19-22)."""

from . import common, disney, lambert, microfacet, microsurface

_REGISTRY = {"disney": disney, "lambert": lambert,
             "microfacet": microfacet, "microsurface": microsurface}


def get(name: str):
    return _REGISTRY[name]


__all__ = ["common", "disney", "lambert", "get"]
