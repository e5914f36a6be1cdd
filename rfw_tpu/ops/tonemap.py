"""Accumulator → display: ACES-fitted tonemap with brightness/contrast.

Reimplements the reference's GL tone-map fullscreen pass
(/root/reference/assets/shaders/tone-map.frag, driven by system.cpp:694-714)
as a jnp op. Input is linear HDR radiance; output linear [0,1] RGB (callers
apply sRGB encoding when writing PNGs).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Stephen Hill's ACES fit matrices (public; identical constants to the
# reference shader, which uses the same well-known fit).
_ACES_INPUT = np.array([
    [0.59719, 0.35458, 0.04823],
    [0.07600, 0.90834, 0.01566],
    [0.02840, 0.13383, 0.83777],
], dtype=np.float32)
_ACES_OUTPUT = np.array([
    [1.60475, -0.53108, -0.07367],
    [-0.10208, 1.10813, -0.00605],
    [-0.00327, -0.07276, 1.07602],
], dtype=np.float32)


def _rrt_and_odt_fit(v):
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_fitted(color):
    """ACESFitted (tone-map.frag): (..., 3) linear → (..., 3) in [0,1]."""
    c = jnp.einsum("ij,...j->...i", jnp.asarray(_ACES_INPUT), color)
    c = _rrt_and_odt_fit(c)
    c = jnp.einsum("ij,...j->...i", jnp.asarray(_ACES_OUTPUT), c)
    return jnp.clip(c, 0.0, 1.0)


def tonemap(hdr, brightness=0.05, contrast=1.0):
    """Full pass (tone-map.frag main): contrast/brightness shift then ACES."""
    x = jnp.maximum(0.0, hdr - 0.5 * contrast + 0.5 + brightness)
    return aces_fitted(x)


def resolve_accumulator(accumulator, sample_count):
    """accumulator/spp (reference blitBuffer, Kernels.cu:181-203)."""
    return accumulator / jnp.maximum(jnp.float32(sample_count), 1.0)
