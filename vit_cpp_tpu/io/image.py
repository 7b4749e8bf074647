"""Host-side image decode.

The reference decodes with stb_image, forcing 3-channel RGB
(load_image_from_file, vit.cpp:109-127). Here the native C++ decoder
(vit_cpp_tpu/native, libjpeg/libpng based) is preferred for throughput and a
PIL fallback covers any format; both return the same (H, W, 3) uint8 layout.
"""

from __future__ import annotations

import numpy as np

# formats some decoder in the chain can read: native decode handles
# jpg/png/bmp/pnm, the per-file PIL retry covers gif/tga/webp; shared by
# the serve CLI's directory walk and the finetune dataset walk
IMAGE_EXTS = {
    ".jpg", ".jpeg", ".png", ".bmp", ".ppm", ".pgm", ".pnm", ".gif",
    ".tga", ".webp", ".JPEG", ".JPG", ".PNG", ".BMP",
}


def _load_native(path: str):
    try:
        from vit_cpp_tpu.native import decoder
    except Exception:
        return None
    return decoder.decode_rgb(path)


def load_image_rgb(path: str, prefer_native: bool = True) -> np.ndarray:
    """Decode an image file to (H, W, 3) uint8 RGB."""
    if prefer_native:
        img = _load_native(path)
        if img is not None:
            return img
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_images_rgb_batch(paths, n_threads: int = 0):
    """Decode many files -> list of (H, W, 3) uint8 or None per file.

    The throughput path: native threaded batch decode
    (JPEG/PNG/BMP/PNM), then a per-file PIL retry for anything the native
    decoder rejected (GIF/TGA/WebP/...) — matching the reference's
    stb_image format breadth (vit.h:5) without giving up the native pool.
    None marks a file no decoder could read (harness-style skip,
    reference tests/benchmark.cpp:108-125).
    """
    paths = list(paths)
    try:
        from vit_cpp_tpu.native import decoder

        images = decoder.decode_batch(paths, n_threads=n_threads)
    except Exception:
        images = [None] * len(paths)
    out = []
    for p, im in zip(paths, images):
        if im is None:
            try:
                im = load_image_rgb(p, prefer_native=False)
            except OSError:
                im = None
        out.append(im)
    return out
