"""Compacted wavefront driver == fused trace_sample.

All RNG is pixel-id-keyed, so lane compaction does not change any pixel's
estimator; with the deterministic bvh intersector the frames agree to
float ulps (XLA fuses FMAs differently across the two jit graphs, so
exact bit-equality across compilations is not guaranteed — the tolerance
here is a few ulps, far below one 8-bit display step)."""

import numpy as np

import rfw_tpu
from rfw_tpu.config import RenderConfig
from rfw_tpu.render import RenderStatus, create_engine
from rfw_tpu.scene import HostMaterial, MaterialList, make_quad
from rfw_tpu.scene.lights import PointLight, pack_lights


def _scene(eng):
    ml = MaterialList()
    ml.add(HostMaterial(color=np.array([0.7, 0.6, 0.5]), roughness=1.0))
    ml.add(HostMaterial(color=np.array([0.3, 0.4, 0.8]), roughness=0.2))
    eng.set_materials(ml.generate_device_materials())
    eng.set_lights(pack_lights(
        [], [PointLight(position=np.array([1.0, 4.0, -1.0], np.float32),
                        radiance=np.array([30.0, 30.0, 30.0], np.float32))],
        [], []))
    eng.set_mesh(0, make_quad([0, 1, 0], [0, 0, 0], 8, 8, 0).triangles())
    eng.set_mesh(1, make_quad([0, 0, -1], [0, 1, 1.5], 2, 2, 1).triangles())
    eng.set_instance(0, 0, np.eye(4, dtype=np.float32))
    eng.set_instance(1, 1, np.eye(4, dtype=np.float32))


def _render(eng, samples=3):
    cam = rfw_tpu.Camera()
    cam.resize(64, 48)
    cam.fov = 55
    cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
    eng.resize(64, 48)
    return np.asarray(eng.render_frame(cam.get_view().as_pytree(),
                                       RenderStatus.RESET,
                                       samples=samples))


def test_compacted_equals_fused():
    # small chunk → the frame spans 3 chunks, exercising the chunked
    # per-depth loop + live-count readbacks (single-chunk frames route to
    # the fused path by design)
    cfg = RenderConfig(max_path_length=2, blue_noise=False,
                       max_rays_per_pass=1024)
    fused = create_engine("megakernel", cfg)     # fused path, bvh
    _scene(fused)
    img_f = _render(fused)

    comp = create_engine("megakernel", cfg)
    comp.use_wavefront_driver = True             # same intersector, compacted
    _scene(comp)
    img_c = _render(comp)

    assert img_c.shape == img_f.shape
    assert np.abs(img_c - img_f).max() < 1e-5, (
        f"max abs diff {np.abs(img_c - img_f).max()}")


def test_compacted_stats_and_probe():
    cfg = RenderConfig(max_path_length=2, blue_noise=False,
                       max_rays_per_pass=1024, profile_stages=True)
    eng = create_engine("megakernel", cfg)
    eng.use_wavefront_driver = True
    _scene(eng)
    eng.set_probe_index((30, 20))
    img = _render(eng, samples=2)
    assert np.isfinite(img).all() and img.mean() > 1e-5
    s = eng.stats
    assert s.primary_count == 64 * 48   # stats reflect the last sample
    assert s.secondary_count > 0
    assert s.shadow_count > 0
    assert s.primary_time > 0 and s.secondary_time > 0
    inst, prim, dist = eng.get_probe_results()
    assert dist > 0 and inst in (0, 1)


def test_onejit_step_equals_profiled():
    """The production step is ONE jitted dispatch (fori-chunked depths
    with traced trip counts, no host syncs); the profiled step is the
    host loop with per-depth syncs that fills depth_times. Both compose
    the same stage/compaction functions in the same order — frames agree
    to float ulps (different jit graphs fuse FMAs differently; see module
    docstring), and the profiled step must leave per-depth times."""
    cfg = RenderConfig(max_path_length=2, blue_noise=False,
                       max_rays_per_pass=1024)
    eng = create_engine("megakernel", cfg)
    eng.use_wavefront_driver = True
    _scene(eng)
    eng.resize(64, 48)
    eng.update()
    step = eng._get_trace_fn(64, 48)
    drv = eng._driver
    assert drv is not None and step == drv.step
    import jax.numpy as jnp
    cam = rfw_tpu.Camera()
    cam.resize(64, 48)
    cam.fov = 55
    cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
    view = cam.get_view().as_pytree()
    acc0 = jnp.zeros((64 * 48, 3), jnp.float32)
    acc_a, probe_a, stats_a, aux_a = drv.step(
        eng._scene, acc0, view, jnp.uint32(0), jnp.int32(0))
    acc0 = jnp.zeros((64 * 48, 3), jnp.float32)
    acc_b, probe_b, stats_b, aux_b = drv.step_profiled(
        eng._scene, acc0, view, jnp.uint32(0), jnp.int32(0))
    assert np.abs(np.asarray(acc_a) - np.asarray(acc_b)).max() < 1e-5
    assert np.allclose(np.asarray(probe_a), np.asarray(probe_b))
    for k in stats_b:
        assert int(stats_a[k]) == int(stats_b[k]), k
    assert np.abs(np.asarray(aux_a["normal"])
                  - np.asarray(aux_b["normal"])).max() < 1e-5
    assert len(drv.depth_times) == 3 and all(t >= 0 for t in drv.depth_times)


def test_multi_sample_batch_bitwise():
    """The multi-chunk multi-sample batch (one dispatch, traced sample
    count, fori over the SAME sample body) must equal N single-sample
    ``step`` dispatches bitwise — same body, same accumulation order;
    stats keep the last sample's values."""
    import jax.numpy as jnp
    cfg = RenderConfig(max_path_length=2, blue_noise=False,
                       max_rays_per_pass=1024)
    eng = create_engine("megakernel", cfg)
    eng.use_wavefront_driver = True
    _scene(eng)
    eng.resize(64, 48)
    eng.update()
    eng._get_trace_fn(64, 48)
    drv = eng._driver
    cam = rfw_tpu.Camera()
    cam.resize(64, 48)
    cam.fov = 55
    cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
    view = cam.get_view().as_pytree()

    acc = jnp.zeros((64 * 48, 3), jnp.float32)
    acc_m, probe_m, stats_m, aux_m = drv.step_multi(
        eng._scene, acc, view, 0, 0, 3)

    acc = jnp.zeros((64 * 48, 3), jnp.float32)
    for s in range(3):
        acc, probe_l, stats_l, aux_l = drv.step(
            eng._scene, acc, view, jnp.uint32(s), jnp.int32(0))
    assert np.array_equal(np.asarray(acc_m), np.asarray(acc))
    assert np.array_equal(np.asarray(probe_m), np.asarray(probe_l))
    for k in stats_l:
        assert int(stats_m[k]) == int(stats_l[k]), k
    assert np.array_equal(np.asarray(aux_m["normal"]),
                          np.asarray(aux_l["normal"]))


def test_single_sample_routes_through_batch_program():
    """samples=1 on the driver path rides step_multi (fori_loop(0, 1)
    over the same sample body — one compiled program for EVERY sample
    count, so an interactive 1-spp frame never pays a second program
    set's first-execution compile) and must equal the single-sample
    ``step`` program bitwise."""
    import jax.numpy as jnp
    cfg = RenderConfig(max_path_length=2, blue_noise=False,
                       max_rays_per_pass=1024)
    eng = create_engine("megakernel", cfg)
    eng.use_wavefront_driver = True
    _scene(eng)
    eng.resize(64, 48)
    eng.update()
    eng._get_trace_fn(64, 48)
    drv = eng._driver
    cam = rfw_tpu.Camera()
    cam.resize(64, 48)
    cam.fov = 55
    cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
    view = cam.get_view().as_pytree()

    # the engine ABI path with samples=1 must hit step_multi, not step
    import unittest.mock as mock
    with mock.patch.object(drv, "step",
                           side_effect=AssertionError("step used")):
        frame = eng.render_frame(view, RenderStatus.RESET, samples=1)
    assert np.isfinite(frame).all() and frame.mean() > 0

    acc = jnp.zeros((64 * 48, 3), jnp.float32)
    acc_m, probe_m, stats_m, aux_m = drv.step_multi(
        eng._scene, acc, view, 0, 0, 1)
    acc = jnp.zeros((64 * 48, 3), jnp.float32)
    acc_s, probe_s, stats_s, aux_s = drv.step(
        eng._scene, acc, view, jnp.uint32(0), jnp.int32(0))
    assert np.array_equal(np.asarray(acc_m), np.asarray(acc_s))
    assert np.array_equal(np.asarray(probe_m), np.asarray(probe_s))
    for k in stats_s:
        assert int(stats_m[k]) == int(stats_s[k]), k


def test_pixel_cache_bitwise():
    """The precomputed sample-invariant raygen values (sx/sy div-mod,
    blue-noise shift rows — ops.raygen pixel_cache) must be bitwise
    equal to the inline per-sample computation; blue noise ON so the
    cached bn_row branch is exercised."""
    import jax.numpy as jnp
    cfg = RenderConfig(max_path_length=2, blue_noise=True,
                       max_rays_per_pass=1024)
    eng = create_engine("megakernel", cfg)
    eng.use_wavefront_driver = True
    _scene(eng)
    eng.resize(64, 48)
    eng.update()
    eng._get_trace_fn(64, 48)
    drv = eng._driver
    cam = rfw_tpu.Camera()
    cam.resize(64, 48)
    cam.fov = 55
    cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
    view = cam.get_view().as_pytree()

    acc0 = jnp.zeros((64 * 48, 3), jnp.float32)
    acc_c, probe_c, stats_c, _ = drv.step(
        eng._scene, acc0, view, jnp.uint32(0), jnp.int32(0))
    assert "bn_row" in drv._pixel_cache(eng._scene)

    acc0 = jnp.zeros((64 * 48, 3), jnp.float32)
    acc_n, probe_n, stats_n, _ = drv._sample_fn(
        eng._scene, acc0, drv._pid_dev, drv._inv_dev, view,
        jnp.uint32(0), jnp.int32(0), None)
    assert np.asarray(acc_c).mean() > 1e-5
    assert np.array_equal(np.asarray(acc_c), np.asarray(acc_n))
    assert np.array_equal(np.asarray(probe_c), np.asarray(probe_n))
    for k in stats_n:
        assert int(stats_c[k]) == int(stats_n[k]), k


def test_compact_via_sort_bitwise():
    """Sort-carry compaction (one stable multi-operand lax.sort) must
    be bitwise-identical to argsort + row gather: stable sort realizes
    the same permutation, and nothing else in the pipeline changes."""
    base = RenderConfig(max_path_length=2, blue_noise=False,
                        max_rays_per_pass=1024, compact_via_sort=False)
    a = create_engine("megakernel", base)
    a.use_wavefront_driver = True
    _scene(a)
    img_a = _render(a, samples=2)

    import dataclasses
    b = create_engine("megakernel",
                      dataclasses.replace(base, compact_via_sort=True))
    b.use_wavefront_driver = True
    _scene(b)
    img_b = _render(b, samples=2)
    assert np.array_equal(img_a, img_b)


def test_denoise_aux_pixel_order():
    """Driver aux stays in tile-permuted lane order per sample (the
    per-sample inverse gather was hoisted to denoise time); after
    aux_inverse it must be in PIXEL order — pinned against the fused
    path, which returns aux pixel-ordered (same scene, same sampler)."""
    cfg = RenderConfig(max_path_length=2, blue_noise=False,
                       max_rays_per_pass=1024)
    comp = create_engine("megakernel", cfg)
    comp.use_wavefront_driver = True
    _scene(comp)
    comp.set_setting("denoise", "1")
    img_c = _render(comp, samples=2)   # exercises denoise(frame, aux...)
    assert np.isfinite(img_c).all() and img_c.mean() > 1e-5

    drv = comp._driver
    assert drv is not None
    # drive the driver directly for the aux planes
    import jax.numpy as jnp
    cam = rfw_tpu.Camera()
    cam.resize(64, 48)
    cam.fov = 55
    cam.look_at([0, 2.5, -5.0], [0, 0.8, 0.0])
    view = cam.get_view().as_pytree()
    acc0 = jnp.zeros((64 * 48, 3), jnp.float32)
    _, _, _, aux = drv.step(comp._scene, acc0, view, 0, 0)
    aux_px = drv.aux_inverse(aux)

    fused = create_engine("megakernel", cfg)
    _scene(fused)
    fused.resize(64, 48)
    fused.update()
    from rfw_tpu.render.integrator import trace_sample
    _, _, _, aux_f = trace_sample(
        fused._scene, view, 64, 48, 0, 0, cfg,
        __import__("rfw_tpu.render.intersectors",
                   fromlist=["FACTORIES"]).FACTORIES["bvh"](cfg))
    assert np.abs(np.asarray(aux_px["normal"])
                  - np.asarray(aux_f["normal"])).max() < 1e-5
    assert np.abs(np.asarray(aux_px["depth"])
                  - np.asarray(aux_f["depth"])).max() < 1e-4
