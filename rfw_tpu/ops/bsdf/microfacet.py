"""Microfacet BSDF — GGX specular + Lambert base.

The rebuild's analog of the reference's alternative microfacet BSDF
(/root/reference/RFW/system/context/rfw/bsdf/microfacet.h — an anisotropic
Beckmann model kept behind comments in bsdf/bsdf.h). Rather than porting the
Beckmann sampling tables, this is the modern GGX equivalent with the same
eval/sample/pdf contract as disney.py/lambert.py, selectable via
``RenderConfig(bsdf="microfacet")``: importance-sampled GGX NDF, Smith
masking, Schlick Fresnel tinted by specular color, energy split between
diffuse and specular by Fresnel at the macro normal.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import (INVPI, TWOPI, diffuse_reflection_cos_weighted, dot3,
                     gtr2, lerp, reflect, safe_normalize, schlick_fresnel,
                     smith_ggx, sqr, tangent_to_world)


def _alpha(sd):
    return jnp.maximum(sqr(sd["roughness"]), 1e-4)


def _spec_color(sd):
    # F0 from specular parameter (0.5 → 4% like the Disney 0.08 scale) and
    # metallic tint toward base color
    f0 = (0.08 * sd["specular"])[..., None]
    return lerp(jnp.broadcast_to(f0, sd["color"].shape), sd["color"],
                sd["metallic"][..., None])


def _eval_terms(sd, n, wo, wi):
    a = _alpha(sd)
    h = safe_normalize(wo + wi)
    n_dot_h = dot3(n, h)
    n_dot_o = dot3(n, wo)
    n_dot_i = dot3(n, wi)
    d = gtr2(n_dot_h, a)
    g = smith_ggx(jnp.abs(n_dot_o), a) * smith_ggx(jnp.abs(n_dot_i), a)
    f = _spec_color(sd) + (1.0 - _spec_color(sd)) \
        * schlick_fresnel(dot3(wi, h))[..., None]
    spec = (d * g)[..., None] * f
    kd = (1.0 - sd["metallic"])[..., None] * (1.0 - _spec_color(sd))
    diff = kd * sd["color"] * INVPI
    val = jnp.where((n_dot_i > 0)[..., None], spec + diff, 0.0)

    pdf_h = d * jnp.maximum(n_dot_h, 0.0)
    pdf_spec = 0.25 * pdf_h / jnp.maximum(dot3(wi, h), 1e-6)
    pdf_diff = jnp.maximum(n_dot_i, 0.0) * INVPI
    spec_prob = _spec_prob(sd)
    pdf = jnp.where(n_dot_i > 0,
                    lerp(pdf_diff, pdf_spec, spec_prob), 0.0)
    return val, pdf


def _spec_prob(sd):
    """Probability of sampling the specular lobe: mean F0 vs diffuse albedo."""
    spec_l = jnp.mean(_spec_color(sd), axis=-1)
    diff_l = jnp.mean(sd["color"], axis=-1) * (1.0 - sd["metallic"])
    return jnp.clip(spec_l / jnp.maximum(spec_l + diff_l, 1e-6), 0.1, 0.9)


def evaluate_bsdf(sd, i_n, t_vec, b_vec, wo, wi):
    return _eval_terms(sd, i_n, wo, wi)


def sample_bsdf(sd, i_n, n, t_vec, b_vec, wo, t_dist, backfacing, r3, r4):
    a = _alpha(sd)
    spec_prob = _spec_prob(sd)
    take_spec = r3 < spec_prob
    # renormalize r3 within its branch
    r3s = r3 / jnp.maximum(spec_prob, 1e-6)
    r3d = (r3 - spec_prob) / jnp.maximum(1.0 - spec_prob, 1e-6)

    # GGX half-vector sample
    cos_h = jnp.sqrt(jnp.maximum((1.0 - r4) / (1.0 + (a * a - 1.0) * r4),
                                 0.0))
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    phi = TWOPI * r3s
    h_local = jnp.stack([sin_h * jnp.cos(phi), sin_h * jnp.sin(phi), cos_h],
                        axis=-1)
    h = tangent_to_world(h_local, t_vec, b_vec, i_n)
    h = jnp.where((dot3(h, wo) <= 0)[..., None], -h, h)
    wi_spec = reflect(-wo, h)

    wi_diff = tangent_to_world(
        diffuse_reflection_cos_weighted(r3d, r4), t_vec, b_vec, i_n)

    wi = jnp.where(take_spec[..., None], wi_spec, wi_diff)
    val, pdf = _eval_terms(sd, i_n, wo, wi)
    return val, wi, pdf, jnp.zeros_like(pdf, jnp.int32)
