"""Native (C++) BVH builder: equivalence with the numpy path + refit."""

import numpy as np
import pytest

from rfw_tpu.bvh.builder import _build_bvh_numpy, build_bvh, triangle_bounds
from rfw_tpu.native import available, native_refit_bvh


def random_tris(n=3000, seed=4):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    return np.stack([
        v0, v0 + rng.uniform(-.5, .5, (n, 3)).astype(np.float32),
        v0 + rng.uniform(-.5, .5, (n, 3)).astype(np.float32)], 1)


needs_native = pytest.mark.skipif(not available(),
                                  reason="librfw_bvh.so not built")


@needs_native
def test_native_matches_numpy():
    verts = random_tris()
    tmin, tmax = triangle_bounds(verts)
    a = build_bvh(tmin, tmax, leaf_size=4, use_native=True)
    b = _build_bvh_numpy(tmin, tmax, leaf_size=4)
    a.validate()
    assert a.node_count == b.node_count
    # same SAH cost (identical splits; traversal order may permute leaves)
    def sah(x):
        leaf = x.count > 0
        d = np.maximum(x.bmax - x.bmin, 0)
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        return float((area[leaf] * x.count[leaf]).sum())
    assert abs(sah(a) - sah(b)) / sah(b) < 1e-4
    assert sorted(a.prim_order.tolist()) == list(range(len(verts)))


@needs_native
def test_native_refit():
    verts = random_tris(1500, seed=9)
    tmin, tmax = triangle_bounds(verts)
    bvh = build_bvh(tmin, tmax, leaf_size=4, use_native=True)
    # deform: translate + stretch
    verts2 = verts * np.array([1.2, 0.9, 1.0], np.float32) + 0.5
    tmin2, tmax2 = triangle_bounds(verts2)
    ok = native_refit_bvh(bvh, tmin2, tmax2)
    assert ok
    bvh.validate()
    # refit bounds contain the new triangles
    assert (bvh.bmin[0] <= tmin2.min(0) + 1e-4).all()
    assert (bvh.bmax[0] >= tmax2.max(0) - 1e-4).all()
