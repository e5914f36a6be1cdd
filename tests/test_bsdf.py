"""BSDF unit tests (SURVEY §4c): white furnace, pdf integral,
sample/eval consistency — for every registered BSDF model."""

import jax.numpy as jnp
import numpy as np
import pytest

from rfw_tpu.ops import bsdf as bsdf_mod
from rfw_tpu.ops.shade import create_tangent_space

MODELS = ["lambert", "disney", "microfacet"]


def make_sd(n, color=0.75, roughness=0.5, metallic=0.0, transmission=0.0):
    z = jnp.zeros(n)
    return {
        "color": jnp.full((n, 3), color),
        "absorption": jnp.zeros((n, 3)),
        "metallic": z + metallic,
        "subsurface": z,
        "specular": z + 0.5,
        "roughness": z + roughness,
        "specular_tint": z,
        "anisotropic": z,
        "sheen": z,
        "sheen_tint": z,
        "clearcoat": z,
        "clearcoat_gloss": z + 1.0,
        "transmission": z + transmission,
        "eta": z + 1.0,
    }


def frame(n_rays):
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rays, 3))
    t, b = create_tangent_space(n)
    return n, t, b


@pytest.mark.parametrize("model", MODELS)
def test_pdf_integrates_to_one_ish(model):
    """∫ pdf dω over the hemisphere ≈ total sampling mass (≤1; lobes that
    can sample below the horizon lose a bit)."""
    m = bsdf_mod.get(model)
    n_rays = 200_000
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:, 2] = np.abs(d[:, 2])      # upper hemisphere
    wi = jnp.asarray(d.astype(np.float32))
    n, t, b = frame(n_rays)
    wo = jnp.broadcast_to(jnp.array([0.3, 0.1, 0.9]) /
                          np.linalg.norm([0.3, 0.1, 0.9]), (n_rays, 3))
    sd = make_sd(n_rays)
    _, pdf = m.evaluate_bsdf(sd, n, t, b, wo, wi)
    integral = float(jnp.mean(pdf)) * 2 * np.pi   # hemisphere area
    assert 0.5 < integral < 1.1


@pytest.mark.parametrize("model", MODELS)
def test_sample_eval_consistency(model):
    """E[f·cos/pdf] over BSDF samples = directional-hemispherical
    reflectance ρ_dh ≤ 1 (white furnace bound), and eval at the sampled
    direction matches the returned value."""
    m = bsdf_mod.get(model)
    n_rays = 100_000
    rng = np.random.default_rng(1)
    r3 = jnp.asarray(rng.random(n_rays, dtype=np.float32))
    r4 = jnp.asarray(rng.random(n_rays, dtype=np.float32))
    n, t, b = frame(n_rays)
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rays, 3))
    sd = make_sd(n_rays, color=1.0, roughness=0.6)
    val, wi, pdf, _ = m.sample_bsdf(sd, n, n, t, b, wo, jnp.zeros(n_rays),
                                    jnp.zeros(n_rays, bool), r3, r4)
    cos = jnp.sum(wi * n, axis=-1)
    ok = (pdf > 1e-6) & (cos > 0)
    est = jnp.where(ok, val[:, 0] * cos / jnp.maximum(pdf, 1e-9), 0.0)
    rho = float(jnp.mean(est))
    assert 0.3 < rho <= 1.15, rho  # energy conservation (some MC slack)

    val2, pdf2 = m.evaluate_bsdf(sd, n, t, b, wo, wi)
    sel = np.asarray(ok)
    np.testing.assert_allclose(np.asarray(val)[sel], np.asarray(val2)[sel],
                               rtol=1e-4, atol=1e-5)


def test_disney_matches_lambert_for_pure_diffuse():
    """roughness=1, metallic=0, specular=0 Disney ≈ Lambert in the diffuse
    limit (up to the retro-reflection term ≤ factor Fd)."""
    n_rays = 10_000
    rng = np.random.default_rng(2)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:, 2] = np.abs(d[:, 2])
    wi = jnp.asarray(d.astype(np.float32))
    n, t, b = frame(n_rays)
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rays, 3))
    sd = make_sd(n_rays, color=0.5, roughness=1.0)
    sd["specular"] = jnp.zeros(n_rays)
    dv, _ = bsdf_mod.get("disney").evaluate_bsdf(sd, n, t, b, wo, wi)
    lv, _ = bsdf_mod.get("lambert").evaluate_bsdf(sd, n, t, b, wo, wi)
    ratio = np.asarray(dv[:, 0]) / np.maximum(np.asarray(lv[:, 0]), 1e-9)
    # Disney diffuse = lambert * Fd (+ GGX a=1 residue); stays within ~2.5x
    assert ratio.min() > 0.5 and ratio.max() < 2.5


def test_disney_transmission_refracts():
    from rfw_tpu.ops.bsdf import disney
    n_rays = 1000
    n, t, b = frame(n_rays)
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rays, 3))
    sd = make_sd(n_rays, transmission=1.0, roughness=0.05)
    sd["eta"] = jnp.full(n_rays, 1.0 / 1.5)
    rng = np.random.default_rng(3)
    r3 = jnp.asarray(rng.random(n_rays, dtype=np.float32))
    r4 = jnp.asarray(rng.random(n_rays, dtype=np.float32))
    val, wi, pdf, stype = disney.sample_bsdf(
        sd, n, n, t, b, wo, jnp.zeros(n_rays), jnp.zeros(n_rays, bool),
        r3, r4)
    frac_below = float(jnp.mean((jnp.sum(wi * n, axis=-1) < 0)))
    assert frac_below > 0.5  # mostly transmitted through the surface


def test_microsurface_energy_and_reciprocity():
    """Multiple-scattering microsurface (Heitz 2016): the sampling walk
    conserves energy at color=1 (white furnace — sampled paths carry
    weight color^order == 1 whenever the walk escapes), and the
    stochastic eval is finite, reciprocal-ish and zero below the
    horizon."""
    import numpy as np
    import jax.numpy as jnp
    from rfw_tpu.ops.bsdf import get

    ms = get("microsurface")
    n = 4096
    rng = np.random.default_rng(11)
    i_n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    t = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 3))
    b = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n, 3))
    sd = {"color": jnp.ones((n, 3)),
          "roughness": jnp.full(n, 0.9),
          "metallic": jnp.ones(n), "specular": jnp.full(n, 0.5)}
    wo_l = np.stack([np.full(n, 0.45), np.zeros(n),
                     np.full(n, np.sqrt(1 - 0.45 ** 2))], -1)
    wo = jnp.asarray(wo_l, jnp.float32)
    r3 = jnp.asarray(rng.random(n), jnp.float32)
    r4 = jnp.asarray(rng.random(n), jnp.float32)

    val, wi, pdf, _ = ms.sample_bsdf(sd, i_n, i_n, t, b, wo,
                                     jnp.ones(n), jnp.zeros(n, bool),
                                     r3, r4)
    val, wi, pdf = map(np.asarray, (val, wi, pdf))
    ok = pdf > 1e-6
    assert ok.mean() > 0.98          # almost every walk escapes upward
    # integrator weight = val*cos/pdf == color^order == 1 exactly
    cos_i = np.maximum(wi[:, 2], 1e-4)
    w = val[:, 0] * cos_i / np.maximum(pdf, 1e-9)
    assert np.allclose(w[ok], 1.0, atol=1e-3), (w[ok].min(), w[ok].max())
    assert (wi[ok][:, 2] > 0).all()  # reflection stays above the surface

    # stochastic eval: finite, nonnegative, zero below horizon
    wi_q = jnp.asarray(np.stack(
        [np.full(n, -0.3), np.full(n, 0.2),
         np.full(n, np.sqrt(1 - 0.09 - 0.04))], -1), jnp.float32)
    f, p = ms.evaluate_bsdf(sd, i_n, t, b, wo, wi_q)
    f, p = np.asarray(f), np.asarray(p)
    assert np.isfinite(f).all() and (f >= 0).all() and (p >= 0).all()
    wi_down = jnp.asarray(np.stack(
        [np.zeros(n), np.zeros(n), -np.ones(n)], -1), jnp.float32)
    f2, p2 = ms.evaluate_bsdf(sd, i_n, t, b, wo, wi_down)
    assert float(jnp.abs(f2).max()) == 0.0 and float(p2.max()) == 0.0


def test_microsurface_furnace_render():
    """Rough metal plate under a uniform sky: multiple scattering keeps
    the mean reflected radiance near the sky radiance (energy
    conservation) — a single-scattering model loses >20% at this
    roughness."""
    import numpy as np
    from rfw_tpu.config import RenderConfig
    from rfw_tpu.system import RenderSystem
    from rfw_tpu.scene import Skybox

    cfg = RenderConfig(bsdf="microsurface", blue_noise=False,
                       max_path_length=3, envmap_nee=False,
                       variance_reduction=False)
    rs = RenderSystem("megakernel", cfg)
    m = rs.add_material([1.0, 1.0, 1.0], roughness=0.95, metallic=1.0)
    rs.add_instance(rs.add_quad([0, 1, 0], [0, 0, 0], 50, 50, m))
    sky = Skybox(pixels=np.full((16, 32, 3), 0.5, np.float32))
    rs.set_skybox(sky)
    rs.camera.resize(48, 48)
    rs.camera.look_at([0, 4.0, -4.0], [0, 0, 0.5])
    img = np.asarray(rs.render_frame(samples=48))
    center = img[20:28, 20:28].mean()
    # perfect white furnace would be exactly 0.5; allow MC noise + the
    # walk-cap loss + horizon clamp
    assert 0.40 < center < 0.56, center
