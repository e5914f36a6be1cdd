"""printf-style logger (reference: utils/logger.h:11-56).

DEBUG/WARNING go to stdout/stderr; ``err`` raises (the reference's FAILURE macro
throws a std::runtime_error).
"""

from __future__ import annotations

import os
import sys
import time

_START = time.time()
_VERBOSE = os.environ.get("RFW_TPU_VERBOSE", "1") != "0"


def _stamp() -> str:
    return f"[{time.time() - _START:8.3f}s]"


def debug(fmt: str, *args) -> None:
    if _VERBOSE:
        print(f"{_stamp()} DEBUG: {fmt % args if args else fmt}", file=sys.stdout)


def warning(fmt: str, *args) -> None:
    print(f"{_stamp()} WARNING: {fmt % args if args else fmt}", file=sys.stderr)


def err(fmt: str, *args) -> None:
    raise RuntimeError(fmt % args if args else fmt)
