"""Stochastic one-tap texture filter: expectation equals trilinear."""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.ops import rng
from rfw_tpu.ops.shade import fetch_texel_stochastic, fetch_texel_trilinear


def test_stochastic_expectation_matches_trilinear():
    g = np.random.default_rng(5)
    # one 8x8 texture with 2 mips in a flat atlas
    base = g.random((8, 8, 4)).astype(np.float32)
    mip = base.reshape(4, 2, 4, 2, 4).mean((1, 3))
    atlas = jnp.asarray(np.concatenate(
        [base.reshape(-1, 4), mip.reshape(-1, 4)]))
    desc = jnp.asarray(np.array([[[0, 8, 8], [64, 4, 4]]], np.int32))

    n = 512
    uv = jnp.asarray(g.random((n, 2)).astype(np.float32))
    lam = jnp.asarray((g.random(n) * 1.0).astype(np.float32))
    tid = jnp.zeros(n, jnp.int32)

    ref = np.asarray(fetch_texel_trilinear(atlas, desc, tid, uv, lam))

    acc = np.zeros((n, 4), np.float32)
    reps = 600
    for s in range(reps):
        seed = rng.wang_hash(jnp.full(n, s, jnp.uint32) * jnp.uint32(2654435761)
                             + jnp.arange(n, dtype=jnp.uint32))
        texel, _ = fetch_texel_stochastic(atlas, desc, tid, uv, lam, seed)
        acc += np.asarray(texel)
    mean = acc / reps
    err = np.abs(mean - ref).max()
    assert err < 0.06, err   # MC error of 600 draws of a [0,1] variable
