"""Multiple-scattering microsurface BSDF (Heitz et al. 2016).

Math-for-math reimplementation of the reference's (inactive) conductor
multiple-scattering Smith model — /root/reference/RFW/system/context/rfw/
bsdf/microsurface_scattering.h: Beckmann slope distribution, uniform
height distribution, and the unbiased random-walk estimator: a ray
enters the statistical microsurface at height C1⁻¹(0.999)+1, alternates
``sampleHeight`` (escape test via the height-resolved masking G1) with
the conductor phase function (reflect at a visible microfacet normal
drawn from the Beckmann VNDF), and every bounce contributes a
next-event-estimation term toward ``wo`` (Heitz's eval) — energy is
conserved at every roughness, unlike single-scattering microfacet
models that darken as alpha grows.

Vectorization deviations from the reference (documented, not drift):

* ``erf``/``erfinv`` use ``jax.scipy.special`` instead of the A&S 7.1.26
  polynomial + Giles' inverse (same functions, tighter error).
* The Beckmann visible-slope solve (``sampleP22_11``'s adaptive
  bisection+Newton) runs a FIXED 20-iteration masked bisection/Newton
  hybrid — lockstep lanes can't branch on per-lane convergence.
* The reference reuses its three uniforms for every walk iteration
  (microsurface_scattering.h:438-480 — r1/r2/r3 never advance);
  here each bounce draws fresh xorshift uniforms from a WangHash seed
  derived from the caller's uniforms, removing that correlation.
* The walk is capped at ``MAX_BOUNCES`` masked ``fori`` iterations
  (static shapes); lanes still inside at the cap are marked invalid
  (the integrator kills them — a < 1e-4 event at alpha <= 1).

Estimator contract (render/integrator.py): the walk samples the
geometric BSDF·cos perfectly, so a sampled path of order k has the
exact weight ``color^k``. ``sample_bsdf`` therefore returns
``value = color^k · pdf_claim / cos`` with ``pdf_claim`` from the same
closed-form single-scattering approximation ``_pdf_approx`` that
``evaluate_bsdf`` reports — MIS balance weights stay consistent (any
weights summing to one keep the estimator unbiased; the walk itself
needs no pdf).

Selectable via ``RenderConfig(bsdf="microsurface")``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import erf as _erf
from jax.scipy.special import erfinv as _erfinv

from .common import INVPI, dot3, safe_normalize, tangent_to_world

MAX_BOUNCES = 16
_SQRT_PI_INV_HALF = 0.28209479177387814   # 0.5 / sqrt(pi)
_FLT_BIG = 3.0e37


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


def _wang(s):
    s = (s ^ _u32(61)) ^ (s >> 16)
    s = s * _u32(9)
    s = s ^ (s >> 4)
    s = s * _u32(0x27D4EB2D)
    return s ^ (s >> 15)


def _xorshift(s):
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s, s.astype(jnp.float32) * jnp.float32(2.3283064365387e-10)


# -- heights: uniform on [-1, 1] (mf_height_uniform) ------------------------

def _c1(h):
    return jnp.clip(0.5 * (h + 1.0), 0.0, 1.0)


def _inv_c1(u):
    return jnp.clip(2.0 * u - 1.0, -1.0, 1.0)


# -- Beckmann slopes (mf_slope / mf_slope_beckmann), isotropic alpha --------

def _lambda(alpha, w):
    """Smith Lambda (microsurface_scattering.h:146-162)."""
    cz = jnp.clip(w[..., 2], -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 1e-12))
    a = cz / (sin_t * jnp.maximum(alpha, 1e-6))
    val = 0.5 * (_erf(a) - 1.0) + _SQRT_PI_INV_HALF / a * jnp.exp(-a * a)
    val = jnp.where(cz > 0.9999, 0.0, val)
    val = jnp.where(cz < -0.9999, -1.0, val)
    return val


def _projected_area(alpha, w):
    cz = jnp.clip(w[..., 2], -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 1e-12))
    a = cz / (sin_t * jnp.maximum(alpha, 1e-6))
    val = (0.5 * (_erf(a) + 1.0) * cz
           + _SQRT_PI_INV_HALF * alpha * sin_t * jnp.exp(-a * a))
    val = jnp.where(cz > 0.9999, 1.0, val)
    val = jnp.where(cz < -0.9999, 0.0, val)
    return val


def _ndf(alpha, wm):
    """Beckmann NDF via P22 (h:140-144, 268-280)."""
    wz = jnp.maximum(wm[..., 2], 1e-6)
    sx = -wm[..., 0] / wz
    sy = -wm[..., 1] / wz
    a2 = alpha * alpha
    p22 = jnp.exp(-(sx * sx + sy * sy) / a2) / (jnp.pi * a2)
    return jnp.where(wm[..., 2] > 0.0, p22 / (wz ** 4), 0.0)


def _vndf(alpha, wi, wm):
    """Distribution of visible normals D_wi (h:283-297)."""
    pa = _projected_area(alpha, wi)
    c = 1.0 / jnp.maximum(pa, 1e-9)
    val = c * jnp.maximum(dot3(wi, wm), 0.0) * _ndf(alpha, wm)
    return jnp.where((wm[..., 2] > 0.0) & (pa > 0.0), val, 0.0)


def _sample_p22_11(theta_i, u1, u2):
    """Visible Beckmann slope at alpha=1 (h:182-255): fixed-iteration
    masked bisection/Newton on erf(slope)."""
    sin_t = jnp.sin(theta_i)
    cos_t = jnp.cos(theta_i)
    slope_i = cos_t / jnp.maximum(sin_t, 1e-6)
    proj = (0.5 * (_erf(slope_i) + 1.0) * cos_t
            + _SQRT_PI_INV_HALF * sin_t * jnp.exp(-slope_i * slope_i))
    c = 1.0 / jnp.maximum(proj, 1e-6)

    erf_min = jnp.full_like(theta_i, -0.9999)
    erf_max = jnp.maximum(erf_min, _erf(slope_i))
    erf_cur = 0.5 * (erf_min + erf_max)

    def body(_, st):
        lo, hi, cur = st
        cur = jnp.where((cur >= lo) & (cur <= hi), cur, 0.5 * (lo + hi))
        slope = _erfinv(jnp.clip(cur, -0.9999, 0.9999))
        cdf = jnp.where(
            slope >= slope_i, 1.0,
            c * (_SQRT_PI_INV_HALF * sin_t * jnp.exp(-slope * slope)
                 + cos_t * (0.5 + 0.5 * _erf(slope))))
        diff = cdf - u1
        hi = jnp.where(diff > 0.0, cur, hi)
        lo = jnp.where(diff > 0.0, lo, cur)
        deriv = 0.5 * c * cos_t - 0.5 * c * sin_t * slope
        cur = cur - diff / jnp.where(jnp.abs(deriv) < 1e-6,
                                     jnp.sign(deriv) * 1e-6 + 1e-12, deriv)
        return lo, hi, cur

    lo, hi, cur = jax.lax.fori_loop(0, 20, body,
                                    (erf_min, erf_max, erf_cur))
    sx = _erfinv(jnp.clip(jnp.minimum(hi, jnp.maximum(lo, cur)),
                          -0.9999, 0.9999))
    sy = _erfinv(jnp.clip(2.0 * u2 - 1.0, -0.9999, 0.9999))
    # normal incidence: polar Box-Muller-style direct sample (h:186-194)
    r = jnp.sqrt(-jnp.log(jnp.maximum(u1, 1e-9)))
    phi = 6.28318530718 * u2
    near0 = theta_i < 1e-4
    sx = jnp.where(near0, r * jnp.cos(phi), sx)
    sy = jnp.where(near0, r * jnp.sin(phi), sy)
    bad = proj < 1e-4
    return jnp.where(bad, 0.0, sx), jnp.where(bad, 0.0, sy)


def _sample_vndf(alpha, wi, u1, u2):
    """Sample the visible-normal distribution (h:300-328)."""
    wi11 = safe_normalize(jnp.stack(
        [alpha * wi[..., 0], alpha * wi[..., 1], wi[..., 2]], axis=-1))
    theta = jnp.arccos(jnp.clip(wi11[..., 2], -1.0, 1.0))
    s11x, s11y = _sample_p22_11(theta, u1, u2)
    phi = jnp.arctan2(wi11[..., 1], wi11[..., 0])
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    sx = (cp * s11x - sp * s11y) * alpha
    sy = (sp * s11x + cp * s11y) * alpha
    wm = safe_normalize(jnp.stack(
        [-sx, -sy, jnp.ones_like(sx)], axis=-1))
    # numerical fallback (h:317-323)
    bad = ~jnp.isfinite(sx)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                          wm.shape)
    side = safe_normalize(jnp.stack(
        [wi[..., 0], wi[..., 1], jnp.zeros_like(sx)], axis=-1))
    fb = jnp.where((wi[..., 2] > 0)[..., None], up, side)
    return jnp.where(bad[..., None], fb, wm)


# -- microsurface walk helpers ---------------------------------------------

def _g1_h(alpha, w, h0):
    """Height-resolved masking (h:347-361)."""
    lam = _lambda(alpha, w)
    val = _c1(h0) ** lam
    val = jnp.where(w[..., 2] > 0.9999, 1.0, val)
    return jnp.where(w[..., 2] <= 0.0, 0.0, val)


def _sample_height(alpha, wr, hr, u):
    """Next interaction height, _FLT_BIG = escaped (h:363-384)."""
    lam = _lambda(alpha, wr)
    g1 = _g1_h(alpha, wr, hr)
    escape = u > 1.0 - g1
    h_new = _inv_c1(
        _c1(hr) / jnp.maximum(
            (1.0 - u) ** (1.0 / jnp.where(jnp.abs(lam) < 1e-9, 1e-9, lam)),
            1e-12))
    h = jnp.where(escape, _FLT_BIG, h_new)
    # straight up: always escapes; straight down: resample below hr;
    # grazing: height unchanged
    h = jnp.where(wr[..., 2] > 0.9999, _FLT_BIG, h)
    h = jnp.where(wr[..., 2] < -0.9999, _inv_c1(u * _c1(hr)), h)
    h = jnp.where(jnp.abs(wr[..., 2]) < 1e-4, hr, h)
    return h


def _phase_conductor(alpha, wi, wo):
    """Conductor phase function p(wi→wo) (h:390-401)."""
    wh = safe_normalize(wi + wo)
    val = 0.25 * _vndf(alpha, wi, wh) / jnp.maximum(dot3(wi, wh), 1e-6)
    return jnp.where(wh[..., 2] > 0.0, val, 0.0)


def _to_local(v, t, b, n):
    return jnp.stack([dot3(v, t), dot3(v, b), dot3(v, n)], axis=-1)


def _alpha_of(sd):
    return jnp.maximum(sd["roughness"] ** 2, 1e-3)


def _pdf_approx(alpha, wi_l, wo_l):
    """Closed-form MIS pdf claim: single-scattering VNDF pdf + a cosine
    floor standing in for the higher orders (Heitz's suggested MIS
    proxy). Used identically by evaluate_bsdf and sample_bsdf so MIS
    weights are consistent."""
    ss = _phase_conductor(alpha, wi_l, wo_l)
    cos_floor = jnp.maximum(wo_l[..., 2], 0.0) * INVPI
    return ss * 0.9 + cos_floor * 0.1


def _walk_eval_rgb(alpha, color, wi_l, wo_l, seed):
    """As _walk_eval but weights order k by color^k (conductor
    reflectance per bounce)."""
    wr = -wi_l
    hr = 1.0 + _inv_c1(jnp.full(wi_l.shape[:-1], 0.999, jnp.float32))
    total = jnp.zeros(wi_l.shape[:-1] + (3,), jnp.float32)
    colw = jnp.ones(wi_l.shape[:-1] + (3,), jnp.float32)
    alive = jnp.ones(wi_l.shape[:-1], bool)

    def body(_, st):
        wr, hr, total, colw, alive, seed = st
        seed, u1 = _xorshift(seed)
        seed, u2 = _xorshift(seed)
        seed, u3 = _xorshift(seed)
        h_new = _sample_height(alpha, wr, hr, u1)
        inside = alive & (h_new < _FLT_BIG * 0.5)
        colw_here = colw * color          # k-th bounce applies color^k
        pf = _phase_conductor(alpha, -wr, wo_l)
        shadow = _g1_h(alpha, wo_l, h_new)
        scal = jnp.where(inside & jnp.isfinite(pf * shadow),
                         pf * shadow, 0.0)
        total = total + scal[..., None] * colw_here
        wm = _sample_vndf(alpha, -wr, u2, u3)
        wr_new = safe_normalize(wr - 2.0 * wm * dot3(wr, wm)[..., None])
        wr = jnp.where(inside[..., None], wr_new, wr)
        hr = jnp.where(inside, h_new, hr)
        colw = jnp.where(inside[..., None], colw_here, colw)
        alive = inside & jnp.isfinite(hr) & jnp.isfinite(wr[..., 2])
        return wr, hr, total, colw, alive, seed

    _, _, total, _, _, _ = jax.lax.fori_loop(
        0, MAX_BOUNCES, body, (wr, hr, total, colw, alive, seed))
    return total


def _seed_from(*vals):
    s = _u32(0x9E3779B9)
    for v in vals:
        bits = jax.lax.bitcast_convert_type(
            jnp.asarray(v, jnp.float32), jnp.uint32)
        s = _wang(s ^ bits)
    return s


def evaluate_bsdf(sd, i_n, t_vec, b_vec, wo, wi):
    """Unbiased stochastic eval of f(wo→wi)·(no cos) + the MIS pdf claim.

    Randoms derive from a hash of the query directions — deterministic
    per query, varying per (pixel, sample, bounce) like every other
    stream in the framework."""
    alpha = _alpha_of(sd)
    wo_l = _to_local(wo, t_vec, b_vec, i_n)
    wi_l = _to_local(wi, t_vec, b_vec, i_n)
    seed = _seed_from(wi[..., 0], wi[..., 1], wi[..., 2],
                      wo[..., 0], wo[..., 1], wo[..., 2])
    # reciprocity-friendly: walk from wo, connect to wi (Heitz eval is
    # an estimator of f(wi,wo)·cos(wo) / cos(wo) — the phase-function
    # NEE already integrates the cosine; divide by outgoing cos to
    # return plain f like the other BSDF modules
    val = _walk_eval_rgb(alpha, sd["color"], wo_l, wi_l, seed)
    cos_i = jnp.maximum(wi_l[..., 2], 1e-4)
    f = val / cos_i[..., None]
    ok = (wo_l[..., 2] > 0) & (wi_l[..., 2] > 0)
    f = jnp.where(ok[..., None], f, 0.0)
    pdf = jnp.where(ok, _pdf_approx(alpha, wo_l, wi_l), 0.0)
    return f, pdf


def sample_bsdf(sd, i_n, n, t_vec, b_vec, wo, t_dist, backfacing, r3, r4):
    """Sample by running the walk; weight = color^order exactly (the
    walk importance-samples the geometry term perfectly), expressed
    through the claimed pdf so the integrator's value·cos/pdf equals
    color^order."""
    alpha = _alpha_of(sd)
    wo_l = _to_local(wo, t_vec, b_vec, i_n)
    seed = _seed_from(r3, r4, wo[..., 0], wo[..., 1], wo[..., 2])

    wr = -wo_l
    hr = 1.0 + _inv_c1(jnp.full(wo_l.shape[:-1], 0.999, jnp.float32))
    colw = jnp.ones(wo_l.shape[:-1] + (3,), jnp.float32)
    inside = jnp.ones(wo_l.shape[:-1], bool)

    def body(k, st):
        wr, hr, colw, inside, seed = st
        seed, u1 = _xorshift(seed)
        seed, u2 = _xorshift(seed)
        seed, u3 = _xorshift(seed)
        h_new = _sample_height(alpha, wr, hr, u1)
        bouncing = inside & (h_new < _FLT_BIG * 0.5)
        wm = _sample_vndf(alpha, -wr, u2, u3)
        wr_new = safe_normalize(wr - 2.0 * wm * dot3(wr, wm)[..., None])
        wr = jnp.where(bouncing[..., None], wr_new, wr)
        hr = jnp.where(bouncing, h_new, hr)
        colw = jnp.where(bouncing[..., None], colw * sd["color"], colw)
        inside = bouncing & jnp.isfinite(hr) & jnp.isfinite(wr[..., 2])
        return wr, hr, colw, inside, seed

    wr, hr, colw, inside, _ = jax.lax.fori_loop(
        0, MAX_BOUNCES, body, (wr, hr, colw, inside, seed))

    wi_l = wr
    # invalid: never escaped within the cap, or escaped downward
    valid = ~inside & (wi_l[..., 2] > 1e-5)
    wi_w = safe_normalize(tangent_to_world(wi_l, t_vec, b_vec, i_n))
    cos_i = jnp.maximum(wi_l[..., 2], 1e-4)
    pdf = jnp.where(valid, _pdf_approx(alpha, wo_l, wi_l), 0.0)
    value = colw * (pdf / cos_i)[..., None]
    value = jnp.where(valid[..., None], value, 0.0)
    stype = jnp.zeros(wo_l.shape[:-1], jnp.int32)
    return value, wi_w, pdf, stype
