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


LIB_ASAN = os.path.join(_DIR, "libvitnative-asan.so")
ASAN_FLAGS = ["-fsanitize=address", "-fno-omit-frame-pointer", "-g", "-O1"]


def build(force: bool = False, quiet: bool = True, asan: bool = False) -> str:
    """Compile if stale; returns the shared-library path.

    asan=True builds a separate AddressSanitizer instrumented library
    (libvitnative-asan.so) — the SURVEY §5 "keep C++ host tools ASan-clean"
    target; driven by tools/asan_check.py against malformed inputs.
    """
    lib = LIB_ASAN if asan else LIB
    if (
        not force
        and os.path.exists(lib)
        and os.path.getmtime(lib) >= os.path.getmtime(SRC)
    ):
        return lib
    flags = list(CXXFLAGS)
    if asan:
        flags = [f for f in flags if f != "-O3"] + ASAN_FLAGS
    cmd = [CXX, *flags, SRC, "-o", lib, *LIBS]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"vitnative build failed: {' '.join(cmd)}\n{proc.stderr}"
        )
    if not quiet:
        print(f"built {lib}")
    return lib


if __name__ == "__main__":
    build(
        force="--force" in sys.argv,
        quiet=False,
        asan="--asan" in sys.argv,
    )
