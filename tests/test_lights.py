"""Light sampling unit tests (SURVEY §4c): pick probabilities normalize,
barycentric map is uniform, potentials match the reference formulas."""

import jax.numpy as jnp
import numpy as np

from rfw_tpu.ops import light_sampling as ls
from rfw_tpu.scene.lights import (AreaLight, DirectionalLight, PointLight,
                                  SpotLight, pack_lights)


def _lights():
    area = [AreaLight(
        vertex0=np.array([-1, 4, -1.]), vertex1=np.array([1, 4, -1.]),
        vertex2=np.array([0, 4, 1.]), normal=np.array([0, -1, 0.]),
        radiance=np.array([10., 10, 10]), area=2.0)]
    point = [PointLight(np.array([3, 2, 0.]), np.array([50., 40, 30]))]
    spot = [SpotLight(np.array([-3, 3, 0.]), np.array([0, -1, 0.]),
                      np.array([20., 20, 20]), 0.95, 0.85)]
    dire = [DirectionalLight(np.array([0, -1, 0.]) / 1.0,
                             np.array([1., 1, 1]))]
    return {k: jnp.asarray(v)
            for k, v in pack_lights(area, point, spot, dire).items()}


def test_pick_probs_sum_to_one():
    lights = _lights()
    rng = np.random.default_rng(0)
    i_pt = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    n = jnp.broadcast_to(jnp.array([0., 1, 0]), (64, 3))
    pot = ls.all_potentials(lights, i_pt, n)
    s = np.asarray(pot.sum(axis=1))
    # pick prob of each light = potential/sum; summed over lights = 1
    total = np.zeros(64)
    for li in range(pot.shape[1]):
        total += np.asarray(ls.light_pick_prob(
            jnp.full(64, li, jnp.int32), lights, i_pt, n, i_pt))
    assert np.allclose(total[s > 0], 1.0, atol=1e-5)


def test_random_barycentrics_uniform():
    r = jnp.asarray(np.random.default_rng(1).random(200000,
                                                    dtype=np.float32))
    b = np.asarray(ls.random_barycentrics(r))
    assert np.allclose(b.sum(-1), 1.0, atol=1e-5)
    assert (b >= -1e-6).all()
    # uniform over the triangle: each barycentric has mean 1/3
    assert np.allclose(b.mean(0), [1/3, 1/3, 1/3], atol=0.01)
    # and variance of a uniform barycentric is 1/18
    assert np.allclose(b.var(0), 1/18, atol=0.01)


def test_sampling_covers_all_light_types():
    lights = _lights()
    rng = np.random.default_rng(2)
    n_pts = 4096
    i_pt = jnp.asarray(rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32))
    n = jnp.broadcast_to(jnp.array([0., 1, 0]), (n_pts, 3))
    r0 = jnp.asarray(rng.random(n_pts, dtype=np.float32))
    r1 = jnp.asarray(rng.random(n_pts, dtype=np.float32))
    out = ls.random_point_on_light(lights, r0, r1, i_pt, n,
                                   importance_sample=True)
    idx = np.asarray(out["light_index"])
    picked = set(idx[np.asarray(out["light_pdf"]) > 0].tolist())
    assert len(picked) >= 3      # potential-based IS still reaches most
    assert np.isfinite(np.asarray(out["position"])).all()
    # delta flags: area light (index 0) is not delta, others are
    is_delta = np.asarray(out["is_delta"])
    assert not is_delta[idx == 0].any()
    assert is_delta[idx > 0].all()


def test_calculate_light_pdf_matches_geometry():
    # pdf of hitting an area light: t²/(cosθ·A)
    d = jnp.asarray(np.array([[0, 1, 0.]], np.float32))
    n_l = jnp.asarray(np.array([[0, -1, 0.]], np.float32))
    pdf = ls.calculate_light_pdf(d, jnp.asarray([2.0]), jnp.asarray([4.0]),
                                 n_l)
    assert np.allclose(np.asarray(pdf), 4.0 / (1.0 * 4.0))
