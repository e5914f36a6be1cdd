"""Multi-chip tiling: shard_map render equals the single-device render
(on the 8 virtual CPU devices configured in conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from rfw_tpu.config import RenderConfig
from rfw_tpu.parallel import make_tile_mesh
from rfw_tpu.parallel.tiles import render_tiled
from rfw_tpu.render.integrator import trace_sample
from rfw_tpu.render.intersectors import FACTORIES


def _scene_and_view(width, height):
    import __graft_entry__ as ge
    config = RenderConfig()
    engine, cam = ge._tiny_scene(width, height, config)
    return engine._scene, cam.get_view().as_pytree(), config


def test_tiled_matches_single_device():
    width, height = 32, 32
    scene, view, config = _scene_and_view(width, height)
    intersector = FACTORIES["bvh"](config)

    radiance, _, stats, _aux = jax.jit(
        lambda s, v: trace_sample(s, v, width, height, jnp.uint32(0),
                                  jnp.int32(0), config, intersector)
    )(scene, view)
    single = np.asarray(radiance)

    mesh = make_tile_mesh(8)
    frame, tstats = render_tiled(scene, view, width, height, config,
                                 intersector, samples=1, mesh=mesh)
    tiled = np.asarray(frame).reshape(-1, 3)

    assert np.allclose(single, tiled, rtol=1e-5, atol=1e-5)
    # psum'd counters equal the global count
    assert int(tstats["ray_count_0"]) == width * height


def test_tiled_multi_sample_accumulation():
    width, height = 32, 16
    scene, view, config = _scene_and_view(width, height)
    intersector = FACTORIES["bvh"](config)
    mesh = make_tile_mesh(4)
    frame, _ = render_tiled(scene, view, width, height, config,
                            intersector, samples=3, mesh=mesh)
    assert frame.shape == (height, width, 3)
    assert np.isfinite(np.asarray(frame)).all()
    assert float(jnp.mean(frame)) > 0
