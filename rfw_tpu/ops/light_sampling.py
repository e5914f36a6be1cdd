"""Next-event-estimation light sampling with potential-based importance
sampling and MIS — vectorized jnp port of the reference's light library
(/root/reference/RFW/backends/CUDART/src/lights.h).

The reference caps potential-based IS at MAX_IS_LIGHTS per type via fixed
arrays (lights.h:85-116); here the padded light SoA (scene/lights.py) plays
that role: all four light types are concatenated into one potential vector
(area | point | spot | directional, the reference's ordering), zero-energy
padding slots contribute zero potential and are never picked.

Deliberate deviation from the reference: RandomPointOnLight divides its
returned lightPdf by the light's *energy* (lights.h:231,240,251,261), which
is inconsistent with the implicit-hit path (CalculateLightPDF, lights.h:79-82
has no such division) and biases NEE bright by ~energy. Here the pdf is the
true sampling density (reciprocal solid angle for area lights, r²/falloff
for delta lights), and delta lights carry ``is_delta`` so the integrator
excludes them from MIS with BSDF sampling (a BSDF ray can never hit a delta
light).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bsdf.common import dot3, safe_normalize


def _att(l_vec):
    """1/r² attenuation with the squared distance from the unnormalized L."""
    return 1.0 / jnp.maximum(dot3(l_vec, l_vec), 1e-12)


# ---------------------------------------------------------------------------
# Potential contributions (lights.h:17-77) — I: (R, 3) shading point,
# N: (R, 3) shading normal. Each returns (R, L) potentials.
# ---------------------------------------------------------------------------

def potential_area(lights, i_pt, n, bary=None):
    """PotentialAreaLightContribution (lights.h:17-36). ``bary`` (R, 3)
    evaluates the potential at a sampled point; None uses light.position."""
    if bary is None:
        p = lights["area_position"][None, :, :]
    else:
        p = (bary[:, None, 0:1] * lights["area_v0"][None]
             + bary[:, None, 1:2] * lights["area_v1"][None]
             + bary[:, None, 2:3] * lights["area_v2"][None])
    l_vec = p - i_pt[:, None, :]
    att = _att(l_vec)
    l_dir = safe_normalize(l_vec)
    ln = lights["area_normal"][None]
    ln_dot_l = jnp.maximum(0.0, -dot3(ln, l_dir))
    n_dot_l = jnp.maximum(0.0, dot3(n[:, None, :], l_dir))
    return lights["area_energy"][None] * ln_dot_l * n_dot_l * att


def potential_point(lights, i_pt, n):
    """PotentialPointLightContribution (lights.h:38-46). NOTE: like the
    reference, NdotL uses the *unnormalized* direction."""
    l_vec = lights["point_position"][None] - i_pt[:, None, :]
    n_dot_l = jnp.maximum(0.0, dot3(n[:, None, :], l_vec))
    return lights["point_energy"][None] * n_dot_l * _att(l_vec)


def potential_spot(lights, i_pt, n):
    """PotentialSpotLightContribution (lights.h:48-67)."""
    l_vec = lights["spot_position"][None] - i_pt[:, None, :]
    att = _att(l_vec)
    l_dir = safe_normalize(l_vec)
    denom = lights["spot_cos_inner"] - lights["spot_cos_outer"]
    d = ((jnp.maximum(0.0, -dot3(l_dir, lights["spot_direction"][None]))
          - lights["spot_cos_outer"][None])
         / jnp.where(denom != 0, denom, 1.0)[None])
    n_dot_l = jnp.maximum(0.0, dot3(n[:, None, :], l_dir))
    falloff = jnp.clip(d, 0.0, 1.0)
    return lights["spot_energy"][None] * falloff * n_dot_l * att


def potential_directional(lights, i_pt, n):
    """PotentialDirectionalLightContribution (lights.h:69-77)."""
    ln_dot_l = jnp.maximum(
        0.0, -dot3(lights["dir_direction"][None], n[:, None, :]))
    return lights["dir_energy"][None] * ln_dot_l


def all_potentials(lights, i_pt, n, bary=None):
    """(R, L_total) concatenated potentials in reference pick order."""
    return jnp.concatenate([
        potential_area(lights, i_pt, n, bary),
        potential_point(lights, i_pt, n),
        potential_spot(lights, i_pt, n),
        potential_directional(lights, i_pt, n),
    ], axis=1)


# ---------------------------------------------------------------------------
# Light PDFs and pick probabilities
# ---------------------------------------------------------------------------

def calculate_light_pdf(d, t, light_area, light_normal):
    """CalculateLightPDF (lights.h:79-82): solid-angle pdf of hitting an
    area light with a BSDF ray."""
    denom = -dot3(d, light_normal) * light_area
    return (t * t) / jnp.where(denom != 0, denom, 1.0)


def light_pick_prob(light_idx, lights, i_pt, n, hit_pos):
    """LightPickProb (lights.h:84-116): probability the potential-based
    sampler would have picked ``light_idx`` (a concatenated-order index;
    area lights occupy [0, n_area))."""
    pot = all_potentials(lights, i_pt, n)       # (R, L)
    s = pot.sum(axis=1)
    idx = jnp.clip(light_idx, 0, pot.shape[1] - 1)
    picked = jnp.take_along_axis(pot, idx[:, None], axis=1)[:, 0]
    return jnp.where(s > 0, picked / jnp.maximum(s, 1e-30), 0.0)


def random_barycentrics(r0):
    """RandomBarycentrics (lights.h:119-156): Basu-Owen low-distortion map
    from one uniform float to triangle barycentrics. 16 base-4 digit steps,
    vectorized over rays."""
    uf = (r0 * jnp.float32(4294967295.0)).astype(jnp.uint32)
    ax = jnp.full_like(r0, 1.0)
    ay = jnp.zeros_like(r0)
    bx = jnp.zeros_like(r0)
    by = jnp.full_like(r0, 1.0)
    cx = jnp.zeros_like(r0)
    cy = jnp.zeros_like(r0)
    for i in range(16):
        d = (uf >> (2 * (15 - i))) & jnp.uint32(3)
        # the four subdivision cases (lights.h:130-151)
        anx = jnp.where(d == 0, (bx + cx) * 0.5,
              jnp.where(d == 1, ax,
              jnp.where(d == 2, (bx + ax) * 0.5, (cx + ax) * 0.5)))
        any_ = jnp.where(d == 0, (by + cy) * 0.5,
               jnp.where(d == 1, ay,
               jnp.where(d == 2, (by + ay) * 0.5, (cy + ay) * 0.5)))
        bnx = jnp.where(d == 0, (ax + cx) * 0.5,
              jnp.where(d == 1, (ax + bx) * 0.5,
              jnp.where(d == 2, bx, (cx + bx) * 0.5)))
        bny = jnp.where(d == 0, (ay + cy) * 0.5,
              jnp.where(d == 1, (ay + by) * 0.5,
              jnp.where(d == 2, by, (cy + by) * 0.5)))
        cnx = jnp.where(d == 0, (ax + bx) * 0.5,
              jnp.where(d == 1, (ax + cx) * 0.5,
              jnp.where(d == 2, (bx + cx) * 0.5, cx)))
        cny = jnp.where(d == 0, (ay + by) * 0.5,
              jnp.where(d == 1, (ay + cy) * 0.5,
              jnp.where(d == 2, (by + cy) * 0.5, cy)))
        ax, ay, bx, by, cx, cy = anx, any_, bnx, bny, cnx, cny
    rx = (ax + bx + cx) * (1.0 / 3.0)
    ry = (ay + by + cy) * (1.0 / 3.0)
    return jnp.stack([rx, ry, 1.0 - rx - ry], axis=-1)


def random_point_on_light(lights, r0, r1, i_pt, n,
                          importance_sample: bool = True):
    """RandomPointOnLight (lights.h:159-265), vectorized over rays.

    Returns dict with:
      position (R,3) — point on the picked light (I - 1000*L for directional)
      pick_prob (R,), light_pdf (R,), radiance (R,3)
      light_index (R,) — concatenated-order index (for MIS bookkeeping)
    """
    n_area = lights["area_v0"].shape[0]
    n_point = lights["point_position"].shape[0]
    n_spot = lights["spot_position"].shape[0]
    counts = lights["counts"]
    live_total = (counts[0] + counts[1] + counts[2] + counts[3]).astype(
        jnp.float32)

    bary = random_barycentrics(r0)

    if importance_sample:
        pot = all_potentials(lights, i_pt, n, bary)     # (R, L)
        s = pot.sum(axis=1)
        cdf = jnp.cumsum(pot, axis=1)
        target = (r1 * s)[:, None]
        light_idx = jnp.sum((cdf < target).astype(jnp.int32), axis=1)
        light_idx = jnp.clip(light_idx, 0, pot.shape[1] - 1)
        pick_prob = jnp.take_along_axis(
            pot, light_idx[:, None], axis=1)[:, 0] / jnp.maximum(s, 1e-30)
        no_light = s <= 0.0
    else:
        # uniform pick over live lights (lights.h:219-223). The concatenated
        # arrays are padded per type, so map the uniform index over live
        # lights into the padded layout.
        u = jnp.clip((r0 * live_total).astype(jnp.int32), 0,
                     jnp.maximum(live_total.astype(jnp.int32) - 1, 0))
        in_area = u < counts[0]
        in_point = (~in_area) & (u < counts[0] + counts[1])
        in_spot = (~in_area) & (~in_point) & (
            u < counts[0] + counts[1] + counts[2])
        light_idx = jnp.where(
            in_area, u,
            jnp.where(in_point, n_area + (u - counts[0]),
                      jnp.where(in_spot,
                                n_area + n_point + (u - counts[0] - counts[1]),
                                n_area + n_point + n_spot
                                + (u - counts[0] - counts[1] - counts[2]))))
        pick_prob = jnp.where(live_total > 0, 1.0 / jnp.maximum(
            live_total, 1.0), 0.0) * jnp.ones_like(r0)
        no_light = live_total <= 0

    # evaluate the picked light: compute all four candidate results and
    # select (branchless version of lights.h:226-265)
    # --- area ---
    ai = jnp.clip(light_idx, 0, n_area - 1)
    v0 = lights["area_v0"][ai]
    v1 = lights["area_v1"][ai]
    v2 = lights["area_v2"][ai]
    p_area = (bary[:, 0:1] * v0 + bary[:, 1:2] * v1 + bary[:, 2:3] * v2)
    l_vec = i_pt - p_area
    sq_dist = dot3(l_vec, l_vec)
    l_dir = safe_normalize(l_vec)
    ln = lights["area_normal"][ai]
    ln_dot_l = dot3(l_dir, ln)
    area = lights["area_area"][ai]
    reci_solid = sq_dist / jnp.maximum(area * ln_dot_l, 1e-30)
    pdf_area = jnp.where(
        (ln_dot_l > 0) & (dot3(l_dir, n) < 0), reci_solid, 0.0)
    rad_area = lights["area_radiance"][ai]

    # --- point ---
    pi = jnp.clip(light_idx - n_area, 0, n_point - 1)
    p_point = lights["point_position"][pi]
    l_vec_p = i_pt - p_point
    pdf_point = jnp.where(dot3(l_vec_p, n) < 0,
                          dot3(l_vec_p, l_vec_p), 0.0)
    rad_point = lights["point_radiance"][pi]

    # --- spot ---
    si = jnp.clip(light_idx - n_area - n_point, 0, n_spot - 1)
    p_spot = lights["spot_position"][si]
    l_vec_s = i_pt - p_spot
    sq_s = dot3(l_vec_s, l_vec_s)
    l_dir_s = safe_normalize(l_vec_s)
    denom = (lights["spot_cos_inner"][si] - lights["spot_cos_outer"][si])
    d_fall = (jnp.maximum(0.0, dot3(l_dir_s, lights["spot_direction"][si]))
              - lights["spot_cos_outer"][si]) / jnp.where(
                  denom != 0, denom, 1.0)
    ln_dot_s = jnp.minimum(1.0, d_fall)
    pdf_spot = jnp.where(
        (ln_dot_s > 0) & (dot3(l_dir_s, n) < 0),
        sq_s / jnp.maximum(ln_dot_s, 1e-6), 0.0)
    rad_spot = lights["spot_radiance"][si]

    # --- directional ---
    di = jnp.clip(light_idx - n_area - n_point - n_spot, 0,
                  lights["dir_direction"].shape[0] - 1)
    l_d = lights["dir_direction"][di]
    pdf_dir = jnp.where(dot3(l_d, n) < 0, 1.0, 0.0)
    rad_dir = lights["dir_radiance"][di]
    p_dir = i_pt - 1000.0 * l_d

    is_area = light_idx < n_area
    is_point = (~is_area) & (light_idx < n_area + n_point)
    is_spot = (~is_area) & (~is_point) & (light_idx < n_area + n_point
                                          + n_spot)

    def sel(a, p, s, d):
        return jnp.where(is_area[..., None] if a.ndim == 2 else is_area, a,
               jnp.where(is_point[..., None] if a.ndim == 2 else is_point, p,
               jnp.where(is_spot[..., None] if a.ndim == 2 else is_spot,
                         s, d)))

    position = sel(p_area, p_point, p_spot, p_dir)
    light_pdf = sel(pdf_area, pdf_point, pdf_spot, pdf_dir)
    radiance = sel(rad_area, rad_point, rad_spot, rad_dir)

    light_pdf = jnp.where(no_light, 0.0, light_pdf)
    pick_prob = jnp.where(no_light, 0.0, pick_prob)
    # reference returns direction vec3(1) when no light (lights.h:199-203)
    position = jnp.where(no_light[..., None], i_pt + 1.0, position)
    return {
        "position": position,
        "pick_prob": pick_prob,
        "light_pdf": light_pdf,
        "radiance": radiance,
        "light_index": light_idx,
        "is_delta": ~is_area,
    }
