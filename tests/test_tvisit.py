"""Transposed sub-cell visit intersector (ops/tvisit_intersect.py)
parity vs brute force — the round-5 core's oracle tests (SURVEY §4
pattern, same scenes as test_visit.py). Pallas runs in interpret mode
on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import traverse, tvisit_intersect
from rfw_tpu.render import scene_data
from rfw_tpu.scene.lights import pack_lights
from rfw_tpu.scene.materials import MaterialList
from rfw_tpu.scene.mesh import build_triangles


@pytest.fixture(scope="module")
def soup_scene():
    rng = np.random.default_rng(7)
    nt = 800
    centers = rng.uniform(-10, 10, (16, 3))
    tri_c = centers[rng.integers(0, 16, nt)] + rng.normal(0, 1.2, (nt, 3))
    verts = (tri_c[:, None, :] + rng.normal(0, 0.35, (nt, 3, 3))).astype(
        np.float32)
    soa = build_triangles(verts.reshape(-1, 3),
                          np.arange(nt * 3).reshape(nt, 3))
    inst = scene_data.InstancedMesh(
        triangles=soa, transform=np.eye(4, dtype=np.float32),
        instance_id=0, mesh_slot=0)
    cfg = RenderConfig(subcell_tables=True)
    scene = scene_data.build_device_scene(
        [inst], MaterialList().generate_device_materials(),
        pack_lights([], [], [], []), None, None, cfg)
    scene.pop("_bvh_host")
    scene.pop("_pack_host", None)
    scene = jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, scene)
    return scene, cfg


def _rays(n, seed=0, dead_frac=0.3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tm = np.full(n, 1e30, np.float32)
    tm[rng.random(n) < dead_frac] = 0.0
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)


def _brute(scene, o, d, cfg):
    tris = (scene["tri_vertices"][:, 0],
            scene["tri_vertices"][:, 1] - scene["tri_vertices"][:, 0],
            scene["tri_vertices"][:, 2] - scene["tri_vertices"][:, 0])
    return traverse.brute_force_closest(o, d, tris, t_epsilon=cfg.t_epsilon)


def _assert_parity(scene, cfg, o, d, tm, **kw):
    t_p, prim_p, _, _ = tvisit_intersect.closest_hit(scene, o, d, cfg,
                                                     t_max=tm, **kw)
    t_b, prim_b, _, _ = _brute(scene, o, d, cfg)
    if tm is not None:
        prim_b = jnp.where((t_b < tm) & (prim_b >= 0), prim_b, -1)
    t_p, prim_p = np.asarray(t_p), np.asarray(prim_p)
    t_b, prim_b = np.asarray(t_b), np.asarray(prim_b)
    assert ((prim_p >= 0) == (prim_b >= 0)).all()
    both = (prim_p >= 0) & (prim_b >= 0)
    assert (prim_p[both] == prim_b[both]).mean() > 0.999
    terr = np.abs(t_p[both] - t_b[both])
    assert (terr / np.maximum(t_b[both], 1e-6)).max() < 1e-4


def test_tvisit_closest_matches_brute(soup_scene):
    scene, cfg = soup_scene
    o, d, tm = _rays(1024)
    _assert_parity(scene, cfg, o, d, tm)


def test_tvisit_unsorted_and_envelope(soup_scene):
    scene, cfg = soup_scene
    o, d, tm = _rays(1024, seed=11, dead_frac=0.2)
    _assert_parity(scene, cfg, o, d, tm, sort=False)
    _assert_parity(scene, cfg, o, d, tm, sort=False, coherent=True)


def test_tvisit_any_hit_matches_brute(soup_scene):
    scene, cfg = soup_scene
    o, d, _ = _rays(1024, seed=3, dead_frac=0.0)
    rng = np.random.default_rng(5)
    dist = np.full(1024, 6.0, np.float32)
    dist[rng.random(1024) < 0.3] = 0.0
    dist = jnp.asarray(dist)
    occ = np.asarray(tvisit_intersect.any_hit(scene, o, d, dist, cfg))
    t_b, prim_b, _, _ = _brute(scene, o, d, cfg)
    occ_b = np.asarray((prim_b >= 0) & (np.asarray(t_b) < np.asarray(dist)))
    assert (occ == occ_b).all()


def test_tvisit_overflow_recull_passes(soup_scene, monkeypatch):
    """A tiny parent-window cap forces multi-window recull on every block
    — the cross-window front-to-back exit (bounded by the next PARENT
    entry, which lower-bounds its children's) must stay exact."""
    scene, cfg = soup_scene
    monkeypatch.setattr(tvisit_intersect, "M_C", 2)
    o, d, tm = _rays(512, seed=13, dead_frac=0.2)
    _assert_parity(scene, cfg, o, d, tm)


def test_tvisit_engine_frame_matches_visit():
    """Full wavefront-driver frame with intersector='tvisit' vs 'visit':
    same estimator, same refined winners → frames agree to float ulps
    (the two kernels walk cells in different orders, so coincident-
    triangle ties could differ — none exist in this scene)."""
    import rfw_tpu
    from rfw_tpu.render import RenderStatus, create_engine
    from rfw_tpu.scene import HostMaterial, MaterialList, make_quad
    from rfw_tpu.scene.lights import PointLight, pack_lights

    def build(name):
        cfg = RenderConfig(max_path_length=2, blue_noise=False,
                           max_rays_per_pass=1024)
        eng = create_engine("megakernel", cfg)
        eng.use_wavefront_driver = True
        ml = MaterialList()
        ml.add(HostMaterial(color=np.array([0.7, 0.6, 0.5]),
                            roughness=1.0))
        eng.set_materials(ml.generate_device_materials())
        eng.set_lights(pack_lights(
            [], [PointLight(
                position=np.array([1.0, 4.0, -1.0], np.float32),
                radiance=np.array([30.0, 30.0, 30.0], np.float32))],
            [], []))
        eng.set_mesh(0, make_quad([0, 1, 0], [0, 0, 0], 8, 8,
                                  0).triangles())
        eng.set_instance(0, 0, np.eye(4, dtype=np.float32))
        eng.set_setting("intersector", name)
        cam = rfw_tpu.Camera()
        cam.resize(48, 32)
        cam.fov = 55
        cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
        eng.resize(48, 32)
        return np.asarray(eng.render_frame(cam.get_view().as_pytree(),
                                           RenderStatus.RESET, samples=2))

    a = build("tvisit")
    b = build("visit")
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_tvisit_switch_after_build_rebuilds_tables():
    """Selecting 'tvisit' AFTER the scene was already built (without the
    child tables) must force a FULL rebuild: the refit shortcut keys on
    _anim_key, not _geo_key, and a refit of the old scene cannot add
    bmin32/wplanes32 (regression: KeyError 'bmin32' at trace time)."""
    import rfw_tpu
    from rfw_tpu.render import RenderStatus, create_engine
    from rfw_tpu.scene import HostMaterial, MaterialList, make_quad
    from rfw_tpu.scene.lights import PointLight, pack_lights

    cfg = RenderConfig(max_path_length=1, blue_noise=False)
    eng = create_engine("megakernel", cfg)
    ml = MaterialList()
    ml.add(HostMaterial(color=np.array([0.7, 0.6, 0.5]), roughness=1.0))
    eng.set_materials(ml.generate_device_materials())
    eng.set_lights(pack_lights(
        [], [PointLight(position=np.array([1.0, 4.0, -1.0], np.float32),
                        radiance=np.array([30.0, 30.0, 30.0],
                                          np.float32))], [], []))
    eng.set_mesh(0, make_quad([0, 1, 0], [0, 0, 0], 8, 8, 0).triangles())
    eng.set_instance(0, 0, np.eye(4, dtype=np.float32))
    cam = rfw_tpu.Camera()
    cam.resize(32, 32)
    cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
    eng.resize(32, 32)
    view = cam.get_view().as_pytree()
    a = np.asarray(eng.render_frame(view, RenderStatus.RESET, samples=1))
    eng.set_setting("intersector", "tvisit")    # post-build switch
    b = np.asarray(eng.render_frame(view, RenderStatus.RESET, samples=1))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_tvisit_matches_visit_bitwise_refined(soup_scene):
    """tvisit and visit refine winners through the same Möller–Trumbore
    pass, so on unique-winner rays their (t, prim) agree exactly."""
    from rfw_tpu.ops import visit_intersect
    scene, cfg = soup_scene
    o, d, tm = _rays(768, seed=29)
    t_a, p_a, _, _ = tvisit_intersect.closest_hit(scene, o, d, cfg,
                                                  t_max=tm)
    t_b, p_b, _, _ = visit_intersect.closest_hit(scene, o, d, cfg,
                                                 t_max=tm)
    p_a, p_b = np.asarray(p_a), np.asarray(p_b)
    t_a, t_b = np.asarray(t_a), np.asarray(t_b)
    assert ((p_a >= 0) == (p_b >= 0)).all()
    agree = p_a == p_b
    # ties between coincident triangles may resolve differently (visit
    # walks per-256-block order, tvisit per-128-sub-block order)
    assert agree.mean() > 0.995
    assert np.array_equal(t_a[agree], t_b[agree])
