"""Direct scalar-loop numpy oracles for the reference preprocessors.

Literal re-expressions of the reference's per-pixel algorithms
(vit_image_preprocess_bilinear vit.cpp:130-196, _bicubic vit.cpp:204-287)
used to validate the matmul-based device path in ops/preprocess.py."""

from __future__ import annotations

import numpy as np

from vit_cpp_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD


def _c_round(v: float) -> float:
    """std::round: half away from zero (Python's round() is half-to-even)."""
    return np.floor(v + 0.5) if v >= 0 else np.ceil(v - 0.5)


def bilinear_loop(img: np.ndarray, target: int) -> np.ndarray:
    """(H, W, 3) u8 -> (3, S, S) f32 via the reference's bilinear path."""
    ny, nx, _ = img.shape
    x_scale = nx / target
    y_scale = ny / target
    nx3 = int(nx / x_scale + 0.5)
    ny3 = int(ny / y_scale + 0.5)
    assert nx3 == target and ny3 == target
    out = np.zeros((3, target, target), np.float32)
    m3, s3 = IMAGENET_MEAN, IMAGENET_STD
    for y in range(ny3):
        for x in range(nx3):
            sx = (x + 0.5) * x_scale - 0.5
            sy = (y + 0.5) * y_scale - 0.5
            x0 = max(0, int(np.floor(sx)))
            y0 = max(0, int(np.floor(sy)))
            x1 = min(x0 + 1, nx - 1)
            y1 = min(y0 + 1, ny - 1)
            dx = sx - x0
            dy = sy - y0
            for c in range(3):
                v00 = float(img[y0, x0, c])
                v01 = float(img[y0, x1, c])
                v10 = float(img[y1, x0, c])
                v11 = float(img[y1, x1, c])
                v0 = v00 * (1 - dx) + v01 * dx
                v1 = v10 * (1 - dx) + v11 * dx
                v = v0 * (1 - dy) + v1 * dy
                v2 = min(max(_c_round(v), 0.0), 255.0)
                out[c, y, x] = (v2 - m3[c]) / s3[c]
    return out


def _cubic(p0, p1, p2, p3, t):
    d0, d2, d3 = p0 - p1, p2 - p1, p3 - p1
    a1 = -d0 / 3 + d2 - d3 / 6
    a2 = d0 / 2 + d2 / 2
    a3 = -d0 / 6 - d2 / 2 + d3 / 6
    return p1 + a1 * t + a2 * t * t + a3 * t * t * t


def bicubic_loop(img: np.ndarray, target: int) -> np.ndarray:
    """(H, W, 3) u8 -> (3, S, S) f32 via the reference's bicubic path."""
    ny, nx, _ = img.shape
    tx = nx / target
    ty = ny / target
    clip = lambda v, hi: min(max(v, 0), hi)
    out = np.zeros((3, target, target), np.float32)
    m3, s3 = IMAGENET_MEAN, IMAGENET_STD
    for i in range(target):
        for j in range(target):
            x = int(tx * j)
            y = int(ty * i)
            dx = tx * j - x
            dy = ty * i - y
            for k in range(3):
                col = []
                for jj in range(4):
                    row = clip(y - 1 + jj, ny - 1)
                    p = [
                        float(img[row, clip(x - 1 + s, nx - 1), k])
                        for s in range(4)
                    ]
                    col.append(_cubic(p[0], p[1], p[2], p[3], dx))
                cc = _cubic(col[0], col[1], col[2], col[3], dy)
                cc2 = min(max(_c_round(cc), 0.0), 255.0)
                out[k, i, j] = (cc2 - m3[k]) / s3[k]
    return out
