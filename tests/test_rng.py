"""RNG determinism + uniformity (reference random.h lineage)."""

import jax.numpy as jnp
import numpy as np

from rfw_tpu.ops import rng


def test_wang_hash_deterministic():
    a = rng.wang_hash(jnp.arange(1024, dtype=jnp.uint32))
    b = rng.wang_hash(jnp.arange(1024, dtype=jnp.uint32))
    assert (np.asarray(a) == np.asarray(b)).all()
    # avalanche: nearby seeds decorrelate
    assert len(np.unique(np.asarray(a))) == 1024


def test_random_float_range_and_uniformity():
    seed = rng.wang_hash(jnp.arange(1 << 14, dtype=jnp.uint32))
    seed, v = rng.random_float(seed)
    v = np.asarray(v)
    assert (v >= 0).all() and (v < 1).all()
    assert abs(v.mean() - 0.5) < 0.01
    hist, _ = np.histogram(v, bins=16, range=(0, 1))
    assert hist.min() > 0.7 * v.size / 16


def test_sequence_advances():
    seed = rng.path_seed(jnp.uint32(7), 3)
    seed, vals = rng.random_floats(seed, 4)
    assert len(set(float(x) for x in vals)) == 4


def test_blue_noise_mask_properties():
    m = rng.blue_noise_mask(32)
    assert m.shape == (32, 32)
    # every rank appears exactly once (it's a permutation / dither matrix)
    assert len(np.unique(m)) == 32 * 32
    # blue noise: neighboring ranks should differ a lot on average
    d = np.abs(np.diff(m, axis=0)).mean()
    assert d > 0.25  # white noise gives ~0.33; ordered gradient ~1/1024
