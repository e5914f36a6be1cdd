"""Timing helpers (reference: utils/timer.h, utils/averager.h).

``Timer`` is the RAII microsecond timer; ``Averager`` is the 32-slot ring buffer
used to smooth per-frame stats (reference system.h:175-176).
"""

from __future__ import annotations

import time


class Timer:
    """Elapsed-time helper; ``elapsed()`` in seconds, resettable."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()

    def reset(self) -> None:
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def elapsed_ms(self) -> float:
        return self.elapsed() * 1e3


class Averager:
    """Ring-buffer running average over the last ``size`` samples."""

    def __init__(self, size: int = 32) -> None:
        self._size = size
        self._buf: list[float] = []
        self._idx = 0

    def add_sample(self, v: float) -> None:
        if len(self._buf) < self._size:
            self._buf.append(v)
        else:
            self._buf[self._idx] = v
        self._idx = (self._idx + 1) % self._size

    def get_average(self) -> float:
        if not self._buf:
            return 0.0
        return sum(self._buf) / len(self._buf)
