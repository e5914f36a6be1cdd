"""Process-wide JAX configuration applied on first rfw_tpu compute import.

Persistent compilation cache: the 1080p pipeline takes 2-9 minutes of
XLA+Mosaic compilation per process; with the cache a warm start is ~20 s
(measured 516 s → 23.6 s on the bench scene's first sample). Opt out with
RFW_NO_COMPILE_CACHE=1 or point RFW_COMPILE_CACHE_DIR elsewhere.
"""

from __future__ import annotations

import os

_done = False


def setup() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("RFW_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get(
        "RFW_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "rfw_tpu",
                     "jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:   # cache is best-effort; never break rendering
        pass


setup()
