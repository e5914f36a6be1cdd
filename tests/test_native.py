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


@needs_native
def test_native_loc_build():
    """LOC (PLOC) build mode: valid tree, full prim coverage, traversal
    parity with brute force (reference rtbvh
    BvhType::LocallyOrderedClustering, bvh_tree.cpp:74-101)."""
    import jax.numpy as jnp

    from rfw_tpu.bvh import collapse_wide
    from rfw_tpu.native import native_build_bvh_loc
    from rfw_tpu.bvh.builder import BVH
    from rfw_tpu.ops import traverse

    verts = random_tris(2500, seed=11)
    tmin, tmax = triangle_bounds(verts)
    out = native_build_bvh_loc(tmin, tmax, leaf_size=4)
    assert out is not None
    bvh = BVH(*out)
    bvh.validate()
    assert sorted(bvh.prim_order.tolist()) == list(range(len(verts)))
    # leaves respect the collapse bound
    leaf = bvh.count > 0
    assert bvh.count[leaf].max() <= 4

    wide = collapse_wide(bvh, width=4)
    perm = verts[bvh.prim_order]
    v0 = jnp.asarray(perm[:, 0])
    e1 = jnp.asarray(perm[:, 1] - perm[:, 0])
    e2 = jnp.asarray(perm[:, 2] - perm[:, 0])
    rng = np.random.default_rng(12)
    o = rng.uniform(-6, 6, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    wb = {"bmin": jnp.asarray(wide.bmin), "bmax": jnp.asarray(wide.bmax),
          "child": jnp.asarray(wide.child), "count": jnp.asarray(wide.count)}
    t_b, prim_b, _, _ = traverse.traverse_wide(
        jnp.asarray(o), jnp.asarray(d), wb, (v0, e1, e2), leaf_size=4)
    t_ref, prim_ref, _, _ = traverse.brute_force_closest(
        jnp.asarray(o), jnp.asarray(d), (v0, e1, e2))
    hit_b = np.asarray(prim_b) >= 0
    hit_ref = np.asarray(prim_ref) >= 0
    assert (hit_b == hit_ref).all()
    assert np.allclose(np.asarray(t_b)[hit_b], np.asarray(t_ref)[hit_ref],
                       rtol=1e-5, atol=1e-5)


@needs_native
def test_build_bvh_loc_method_knob():
    verts = random_tris(400, seed=13)
    tmin, tmax = triangle_bounds(verts)
    bvh = build_bvh(tmin, tmax, leaf_size=4, method="loc")
    bvh.validate()
    assert sorted(bvh.prim_order.tolist()) == list(range(len(verts)))
