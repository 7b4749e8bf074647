"""Build the native decoder under AddressSanitizer AND ThreadSanitizer
and fuzz-smoke it.

The SURVEY §5 sanitizer gap closed as a tool: compiles vitnative.cpp +
asan_driver.cpp with -fsanitize=address (then again with
-fsanitize=thread), generates valid AND malformed inputs (truncated
files, bit-flipped scanlines, lying headers — the exact inputs the setjmp
recovery paths exist for), and runs the driver; the batch path exercises
the worker pool, which is what TSan watches. A non-zero exit or a
sanitizer report fails the check.

Usage: python tools/asan_check.py
"""

from __future__ import annotations

import io
import os
import subprocess
import sys
import tempfile

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vit_cpp_tpu.native.build import CXX, LIBS, SRC  # noqa: E402

DRIVER = os.path.join(os.path.dirname(SRC), "asan_driver.cpp")


def make_inputs(d: str) -> list:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (37, 53, 3), dtype=np.uint8))
    paths = []

    def put(name: str, data: bytes) -> None:
        p = os.path.join(d, name)
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)

    for fmt, ext in [
        ("JPEG", "jpg"), ("PNG", "png"), ("BMP", "bmp"), ("PPM", "ppm"),
        ("TGA", "tga"), ("GIF", "gif"),
    ]:
        buf = io.BytesIO()
        img.save(buf, format=fmt)
        data = buf.getvalue()
        put(f"ok.{ext}", data)
        # truncations: header-only, mid-data, off-by-one
        for frac, tag in [(0.1, "head"), (0.6, "mid"), (1.0, "last")]:
            n = max(4, int(len(data) * frac) - (1 if frac == 1.0 else 0))
            put(f"trunc_{tag}.{ext}", data[:n])
        # bit flips in the payload
        for i, off in enumerate([len(data) // 3, len(data) // 2, -10]):
            flipped = bytearray(data)
            flipped[off] ^= 0xFF
            put(f"flip{i}.{ext}", bytes(flipped))
    # lying BMP header: claims a huge image in a tiny file
    lying = bytearray(open(os.path.join(d, "ok.bmp"), "rb").read())
    lying[18:22] = (2**20).to_bytes(4, "little")
    put("lying.bmp", bytes(lying))
    # garbage with each magic
    put("garbage.jpg", b"\xff\xd8" + bytes(rng.integers(0, 256, 300, dtype=np.uint8)))
    put("garbage.png", b"\x89PNG\r\n\x1a\n" + bytes(rng.integers(0, 256, 300, dtype=np.uint8)))
    put("garbage.pnm", b"P6 10 10 255 short")
    # r3 formats: PSD (raw + RLE), HDR (flat + new-RLE), their truncations
    # and lying headers — these decoders are hand-rolled byte walkers, the
    # exact code sanitizers exist for
    import struct

    arr = np.asarray(img)
    h, w = arr.shape[:2]
    psd_head = (
        b"8BPS" + struct.pack(">H", 1) + b"\0" * 6
        + struct.pack(">HIIHH", 3, h, w, 8, 3) + struct.pack(">I", 0) * 3
    )
    psd_raw = psd_head + struct.pack(">H", 0) + b"".join(
        arr[:, :, c].tobytes() for c in range(3)
    )
    put("ok.psd", psd_raw)
    put("trunc.psd", psd_raw[: len(psd_raw) // 2])
    lying_psd = bytearray(psd_raw)
    lying_psd[14:18] = (2**24).to_bytes(4, "big")  # huge height
    put("lying.psd", bytes(lying_psd))
    put("garbage.psd", b"8BPS" + bytes(rng.integers(0, 256, 200, dtype=np.uint8)))
    rgbe = np.concatenate(
        [arr, np.full((h, w, 1), 134, np.uint8)], axis=-1
    )
    hdr = (
        b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
        + f"-Y {h} +X {w}\n".encode() + rgbe.tobytes()
    )
    put("ok.hdr", hdr)
    put("trunc.hdr", hdr[: len(hdr) // 2])
    put("lying.hdr", b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y 99999 +X 99999\nxx")
    put("garbage.hdr", b"#?" + bytes(rng.integers(0, 256, 200, dtype=np.uint8)))
    # TGA RLE truncated inside a run packet + absurd header
    buf = io.BytesIO()
    img.save(buf, format="TGA", rle=True)
    tga = buf.getvalue()
    put("trunc_rle.tga", tga[: len(tga) // 2])
    put("lying.tga", bytes([0, 0, 10]) + b"\0" * 9 + struct.pack("<HH", 60000, 60000) + bytes([24, 0]) + b"\x85\x01\x02")
    put("empty", b"")
    return paths


def _run_sanitizer(d: str, paths: list, flag: str, label: str, env_extra: dict) -> bool:
    exe = os.path.join(d, f"driver_{label}")
    cmd = [
        CXX, f"-fsanitize={flag}", "-fno-omit-frame-pointer", "-g", "-O1",
        "-std=c++17", "-Wall", SRC, DRIVER, "-o", exe, *LIBS,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stderr, file=sys.stderr)
        print(f"{label.upper()} BUILD FAILED", file=sys.stderr)
        return False
    env = dict(os.environ, **env_extra)
    run = subprocess.run([exe, *paths], capture_output=True, text=True, env=env)
    sys.stdout.write(run.stdout)
    sys.stderr.write(run.stderr)
    bad = (
        run.returncode != 0
        or "ERROR: AddressSanitizer" in run.stderr
        or "WARNING: ThreadSanitizer" in run.stderr
    )
    if bad:
        print(f"{label.upper()} CHECK FAILED", file=sys.stderr)
        return False
    print(f"{label} check: clean")
    return True


def main() -> int:
    with tempfile.TemporaryDirectory() as d:
        paths = make_inputs(d)
        ok = _run_sanitizer(
            d, paths, "address", "asan",
            {"ASAN_OPTIONS": "detect_leaks=1:abort_on_error=0"},
        )
        ok = _run_sanitizer(
            d, paths, "thread", "tsan",
            {"TSAN_OPTIONS": "halt_on_error=0 exitcode=66"},
        ) and ok
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
