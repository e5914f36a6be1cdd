"""Disney principled BSDF — vectorized jnp port.

Math-for-math reimplementation of the reference's active BSDF
(/root/reference/RFW/system/context/rfw/bsdf/disney.h — included by
bsdf/bsdf.h:19-22 and compiled into the CPU, CUDA and Vulkan backends), so
images match across engines. All branches become `jnp.where` selects.

``sd`` (ShadingData) is a dict of per-ray arrays:
  color (R,3), absorption (R,3), metallic, subsurface, specular, roughness,
  specular_tint, anisotropic, sheen, sheen_tint, clearcoat, clearcoat_gloss,
  transmission, eta  — all (R,)
with roughness pre-clamped to >= 0.001 (compat.h getRoughness).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import (INV2PI, INVPI, TWOPI, diffuse_reflection_cos_weighted,
                     diffuse_reflection_uniform, dot3, fr, gtr1, gtr2, lerp,
                     reflect, refract_dir, safe_normalize, schlick_fresnel,
                     smith_ggx, sqr, tangent_to_world)

BSDF_REFLECTED = 0
BSDF_TRANSMITTED = 1
BSDF_SPECULAR = 2


def bsdf_pdf(sd, n, wo, wi):
    """BSDFPdf (disney.h:84-103)."""
    roughness = sd["roughness"]
    n_dot_wi = dot3(n, wi)

    # below-surface branch
    brdf_pdf_below = INV2PI * sd["subsurface"] * 0.5

    # above-surface branch
    f = fr(dot3(n, wo), sd["eta"])
    halfway = safe_normalize(wi + wo)
    cos_theta_half = jnp.abs(dot3(halfway, n))
    pdf_half = gtr2(cos_theta_half, roughness) * cos_theta_half
    pdf_spec = 0.25 * pdf_half / jnp.maximum(1e-6, dot3(wi, halfway))
    pdf_diff = jnp.abs(n_dot_wi) * INVPI * (1.0 - sd["subsurface"])
    bsdf_pdf_above = pdf_spec * f
    brdf_pdf_above = lerp(pdf_diff, pdf_spec, 0.5)

    below = n_dot_wi <= 0.0
    brdf = jnp.where(below, brdf_pdf_below, brdf_pdf_above)
    bsdf = jnp.where(below, 0.0, bsdf_pdf_above)
    return lerp(brdf, bsdf, sd["transmission"])


def bsdf_eval(sd, n, wo, wi, t, backfacing):
    """BSDFEval (disney.h:106-188). Returns (R, 3) reflectance."""
    n_dot_l = dot3(n, wi)
    n_dot_v = dot3(n, wo)
    h = safe_normalize(wi + wo)
    n_dot_h = dot3(n, h)
    l_dot_h = dot3(wi, h)
    cdlin = sd["color"]
    cdlum = (0.3 * cdlin[..., 0] + 0.6 * cdlin[..., 1]
             + 0.1 * cdlin[..., 2])
    ctint = jnp.where(cdlum[..., None] > 0.0,
                      cdlin / jnp.maximum(cdlum[..., None], 1e-20), 1.0)
    cspec0 = lerp(
        sd["specular"][..., None] * 0.08
        * lerp(jnp.ones_like(cdlin), ctint, sd["specular_tint"][..., None]),
        cdlin, sd["metallic"][..., None])
    a = sd["roughness"]

    # --- BSDF side (transmission > 0) ---
    f_v = fr(n_dot_v, sd["eta"])
    bsdf_trans = ((1.0 - f_v) / jnp.maximum(jnp.abs(n_dot_l), 1e-7)
                  * (1.0 - sd["metallic"]) * sd["transmission"])[..., None]
    bsdf_trans = jnp.broadcast_to(bsdf_trans, cdlin.shape)

    ds = gtr2(n_dot_h, a)
    fh_exact = fr(l_dot_h, sd["eta"])
    fs_bsdf = lerp(cspec0, jnp.ones_like(cspec0), fh_exact[..., None])
    gs = smith_ggx(n_dot_v, a) * smith_ggx(n_dot_l, a)
    bsdf_spec = (gs * ds)[..., None] * fs_bsdf
    bsdf_side = jnp.where((n_dot_l <= 0.0)[..., None], bsdf_trans, bsdf_spec)

    # --- BRDF side (transmission < 1) ---
    s = jnp.sqrt(jnp.maximum(sd["color"], 0.0))
    fl_abs = schlick_fresnel(jnp.abs(n_dot_l))
    fv = schlick_fresnel(n_dot_v)
    fd_ss = (1.0 - 0.5 * fl_abs) * (1.0 - 0.5 * fv)
    brdf_below = (INVPI * fd_ss * sd["subsurface"]
                  * (1.0 - sd["metallic"]))[..., None] * s
    brdf_below = jnp.where((sd["subsurface"] > 0.0)[..., None],
                           brdf_below, 0.0)

    fh = schlick_fresnel(l_dot_h)
    fs = lerp(cspec0, jnp.ones_like(cspec0), fh[..., None])
    fl = schlick_fresnel(n_dot_l)
    fd90 = 0.5 + 2.0 * l_dot_h * l_dot_h * a
    fd = lerp(1.0, fd90, fl) * lerp(1.0, fd90, fv)
    dr = gtr1(n_dot_h, lerp(0.1, 0.001, sd["clearcoat_gloss"]))
    fc = lerp(0.04, 1.0, fh)
    gr = smith_ggx(n_dot_l, 0.25) * smith_ggx(n_dot_v, 0.25)
    brdf_above = (
        (INVPI * fd * (1.0 - sd["metallic"])
         * (1.0 - sd["subsurface"]))[..., None] * cdlin
        + (gs * ds)[..., None] * fs
        + (sd["clearcoat"] * gr * fc * dr)[..., None])
    brdf_side = jnp.where((n_dot_l <= 0.0)[..., None], brdf_below,
                          brdf_above)

    final = lerp(brdf_side, bsdf_side, sd["transmission"][..., None])
    absorbed = jnp.exp(-sd["absorption"] * t[..., None])
    return jnp.where(backfacing[..., None], final * absorbed, final)


def _sample_half_vector(t, b, n, wo, roughness, r1, r2):
    """GGX half-vector sampling shared by both specular branches
    (disney.h:199-214, 246-257)."""
    cos_theta_half = jnp.sqrt(
        jnp.maximum((1.0 - r2) / (1.0 + (sqr(roughness) - 1.0) * r2), 0.0))
    sin_theta_half = jnp.sqrt(jnp.maximum(1.0 - sqr(cos_theta_half), 0.0))
    phi = r1 * TWOPI
    local = jnp.stack([sin_theta_half * jnp.cos(phi),
                       sin_theta_half * jnp.sin(phi), cos_theta_half],
                      axis=-1)
    halfway = tangent_to_world(local, t, b, n)
    flip = dot3(halfway, wo) <= 0.0
    return jnp.where(flip[..., None], -halfway, halfway)


def bsdf_sample(sd, t_vec, b_vec, n, wo, r3, r4, t_dist, backfacing):
    """BSDFSample (disney.h:191-267), fully branchless.

    Returns (wi, pdf, sample_type). The transmission-specular branch sets
    pdf = (1-F)*transmission like the reference; other branches use
    BSDFPdf.
    """
    transmission = sd["transmission"]
    roughness = sd["roughness"]

    # ---- transmission side (r3 < transmission) ----
    f = fr(dot3(n, wo), sd["eta"])
    r1_t = r3 / jnp.maximum(transmission, 1e-9)
    r2_t = r4 / jnp.maximum(f, 1e-9)
    half_t = _sample_half_vector(t_vec, b_vec, n, wo, roughness, r1_t, r2_t)
    wi_reflect_t = reflect(-wo, half_t)
    refract_ok, wi_refract = refract_dir(wo, n, sd["eta"])
    take_reflect = r4 < f
    wi_trans = jnp.where(take_reflect[..., None], wi_reflect_t, wi_refract)
    type_trans = jnp.where(take_reflect, BSDF_REFLECTED, BSDF_SPECULAR)

    # ---- BRDF side ----
    r1 = (r3 - transmission) / jnp.maximum(1.0 - transmission, 1e-9)
    subsurface = sd["subsurface"]
    # diffuse sub-branch (r4 < 0.5)
    r2d = r4 * 2.0
    r5_ss = r2d / jnp.maximum(subsurface, 1e-9)
    d_ss = diffuse_reflection_uniform(r1, r5_ss)
    d_ss = d_ss * jnp.array([1.0, 1.0, -1.0])
    r5_cos = (r2d - subsurface) / jnp.maximum(1.0 - subsurface, 1e-9)
    d_cos = diffuse_reflection_cos_weighted(r1, r5_cos)
    take_ss = r2d < subsurface
    d_local = jnp.where(take_ss[..., None], d_ss, d_cos)
    wi_diffuse = tangent_to_world(d_local, t_vec, b_vec, n)
    type_diffuse = jnp.where(take_ss, BSDF_TRANSMITTED, BSDF_REFLECTED)
    # specular sub-branch (r4 >= 0.5)
    r2s = (r4 - 0.5) * 2.0
    half_s = _sample_half_vector(t_vec, b_vec, n, wo, roughness, r1, r2s)
    wi_spec = reflect(-wo, half_s)

    take_diffuse = r4 < 0.5
    wi_brdf = jnp.where(take_diffuse[..., None], wi_diffuse, wi_spec)
    type_brdf = jnp.where(take_diffuse, type_diffuse, BSDF_REFLECTED)

    take_trans = r3 < transmission
    wi = jnp.where(take_trans[..., None], wi_trans, wi_brdf)
    stype = jnp.where(take_trans, type_trans, type_brdf)

    pdf = bsdf_pdf(sd, n, wo, wi)
    # transmission-refraction overrides pdf (disney.h:219-226)
    pdf_refract = jnp.where(refract_ok, (1.0 - f) * transmission, 0.0)
    pdf = jnp.where(take_trans & ~take_reflect, pdf_refract, pdf)
    return wi, pdf, stype


def evaluate_bsdf(sd, i_n, t_vec, b_vec, wo, wi):
    """EvaluateBSDF (disney.h:272-278): returns (bsdf (R,3), pdf (R,))."""
    zeros = jnp.zeros_like(sd["roughness"])
    val = bsdf_eval(sd, i_n, wo, wi, zeros, zeros > 1.0)
    pdf = bsdf_pdf(sd, i_n, wo, wi)
    return val, pdf


def sample_bsdf(sd, i_n, n, t_vec, b_vec, wo, t_dist, backfacing, r3, r4):
    """SampleBSDF (disney.h:280-287): returns (bsdf, wi, pdf, sample_type)."""
    wi, pdf, stype = bsdf_sample(sd, t_vec, b_vec, i_n, wo, r3, r4, t_dist,
                                 backfacing)
    val = bsdf_eval(sd, i_n, wo, wi, t_dist, backfacing)
    return val, wi, pdf, stype
