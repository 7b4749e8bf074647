"""Build libvitnative.so from vit_cpp_tpu/native/src.

Equivalent role to the reference's CMake build of its native tree
(CMakeLists.txt:17-18: -O3 -march=native release build), scoped to the
host-side runtime that stays native in the TPU design (image decode; the
tensor math lives in XLA/Pallas). Invoked lazily on first import of
vit_cpp_tpu.native.decoder and cached by source mtime; also runnable
directly: python -m vit_cpp_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "src", "vitnative.cpp")
LIB = os.path.join(_DIR, "libvitnative.so")

CXX = os.environ.get("CXX", "g++")
CXXFLAGS = [
    "-O3",
    "-march=native",
    "-std=c++17",
    "-fPIC",
    "-shared",
    "-Wall",
]
LIBS = ["-ljpeg", "-lpng", "-lz", "-lpthread"]


def build(force: bool = False, quiet: bool = True) -> str:
    """Compile if stale; returns the shared-library path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [CXX, *CXXFLAGS, SRC, "-o", LIB, *LIBS]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"vitnative build failed: {' '.join(cmd)}\n{proc.stderr}"
        )
    if not quiet:
        print(f"built {LIB}")
    return LIB


if __name__ == "__main__":
    build(force="--force" in sys.argv, quiet=False)
