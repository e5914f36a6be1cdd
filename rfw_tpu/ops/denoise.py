"""Edge-avoiding à-trous wavelet denoiser.

The rebuild's analog of the reference's optional OptiX AI denoiser
(/root/reference/RFW/backends/OptiX6Context/src/OptiXContext.cpp:460-467,
812-822 — its only exposed render setting, "DENOISE"). A neural denoiser is
out of scope; the classic SVGF-style à-trous filter gives the same
capability shape (cheap post-pass that trades bias for variance at low spp)
as pure jnp convolutions — XLA fuses the whole pyramid.

Guided by auxiliary feature buffers (normal, depth) when available: the
engines expose them from the primary hit; without them the filter falls
back to color-only edge stopping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# B3-spline à-trous kernel (5 taps)
_KERNEL = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _shift2d(img, dy, dx):
    """Edge-clamped 2-D shift."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def atrous_denoise(color, normal=None, depth=None, iterations: int = 4,
                   sigma_color: float = 0.35, sigma_normal: float = 0.2,
                   sigma_depth: float = 0.5):
    """color: (H, W, 3) HDR; normal: (H, W, 3); depth: (H, W).

    Returns the filtered (H, W, 3) image. Edge-stopping weights follow the
    SVGF formulation: gaussian in color difference, powered cosine in
    normal difference, relative depth difference.
    """
    out = color

    for level in range(iterations):
        step = 1 << level
        accum = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                k = _KERNEL[ky] * _KERNEL[kx]
                c = _shift2d(out, dy, dx)
                dc = jnp.sum((c - out) ** 2, axis=-1, keepdims=True)
                w = k * jnp.exp(-dc / (sigma_color * sigma_color))
                if normal is not None:
                    nn = _shift2d(normal, dy, dx)
                    ndot = jnp.sum(nn * normal, axis=-1, keepdims=True)
                    w = w * jnp.clip(ndot, 0.0, 1.0) ** (
                        1.0 / max(sigma_normal, 1e-3))
                if depth is not None:
                    dd = _shift2d(depth, dy, dx) - depth
                    wz = jnp.exp(-jnp.abs(dd)[..., None] /
                                 (sigma_depth * jnp.maximum(
                                     jnp.abs(depth)[..., None], 1e-3)))
                    w = w * wz
                accum = accum + w * c
                wsum = wsum + w
        out = accum / jnp.maximum(wsum, 1e-8)
    return out


@functools.partial(jax.jit, static_argnames=("iterations",))
def denoise(color, normal=None, depth=None, iterations: int = 4):
    return atrous_denoise(color, normal, depth, iterations)
