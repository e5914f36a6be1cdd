"""Pallas/MXU treelet intersection kernel (TPU fast path).

Placeholder delegating to the dense jnp formulation — replaced by the real
Pallas kernel in this round; the interface (closest_hit / any_hit over the
device scene dict) is final.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig
from .intersect import BIG_T, closest_hit_woop, intersect_woop


def closest_hit(scene, origins, directions, config: RenderConfig):
    tl = scene["treelets"]
    t, slot, u, v = closest_hit_woop(
        origins, directions, tl["woop"], jnp.arange(tl["woop"].shape[0]),
        t_epsilon=config.t_epsilon, tri_verts=tl["verts"])
    prim = jnp.where(slot >= 0, tl["slot_to_prim"][jnp.maximum(slot, 0)], -1)
    return jnp.where(prim >= 0, t, BIG_T), prim, u, v


def any_hit(scene, origins, directions, dist, config: RenderConfig):
    tl = scene["treelets"]
    hit, t, _, _ = intersect_woop(origins, directions, tl["woop"],
                                  t_epsilon=config.t_epsilon)
    return jnp.any(hit & (t < dist[:, None]), axis=-1)
