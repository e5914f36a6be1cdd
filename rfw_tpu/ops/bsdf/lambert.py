"""Lambert BSDF — the reference's simple alternative
(/root/reference/RFW/system/context/rfw/bsdf/lambert.h, selectable in
bsdf/bsdf.h behind comments). Used by tests (analytic furnace results) and
as a cheap mode for previews.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import (INVPI, diffuse_reflection_cos_weighted, dot3,
                     tangent_to_world)


def evaluate_bsdf(sd, i_n, t_vec, b_vec, wo, wi):
    n_dot_wi = dot3(i_n, wi)
    val = jnp.where((n_dot_wi > 0)[..., None], sd["color"] * INVPI, 0.0)
    pdf = jnp.where(n_dot_wi > 0, n_dot_wi * INVPI, 0.0)
    return val, pdf


def sample_bsdf(sd, i_n, n, t_vec, b_vec, wo, t_dist, backfacing, r3, r4):
    local = diffuse_reflection_cos_weighted(r3, r4)
    wi = tangent_to_world(local, t_vec, b_vec, i_n)
    n_dot_wi = jnp.maximum(dot3(i_n, wi), 0.0)
    pdf = n_dot_wi * INVPI
    val = sd["color"] * INVPI
    return val, wi, pdf, jnp.zeros_like(pdf, jnp.int32)
