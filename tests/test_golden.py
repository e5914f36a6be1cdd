"""Golden-image regression (SURVEY §4b): the Cornell render must stay
bit-stable — deterministic RNG + fixed BVH build means any change here is a
real behavior change, not noise."""

import os

import numpy as np

from rfw_tpu.config import RenderConfig
from test_integrator import make_cornell

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "cornell_64_8spp.npy")


def test_cornell_matches_golden():
    rs = make_cornell("megakernel", RenderConfig(blue_noise=True), size=64)
    img = rs.render_frame(samples=8)
    golden = np.load(GOLDEN).astype(np.float32)
    rmse = float(np.sqrt(((img - golden) ** 2).mean()))
    # fp16 storage quantization is the only tolerated difference
    assert rmse < 2e-3, f"golden mismatch: RMSE {rmse}"
