"""Compile the native library: python -m rfw_tpu.native.build"""

import os
import subprocess
import sys


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = ["g++", "-O3", "-march=native", "-ffast-math", "-fPIC",
           "-std=c++17", "-Wall", "-shared",
           "-o", os.path.join(here, "librfw_bvh.so"),
           os.path.join(here, "bvh_builder.cpp")]
    print(" ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
