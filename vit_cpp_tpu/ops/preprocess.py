"""Device-side image preprocessing: resize + normalize as TPU matmuls.

The reference preprocesses on the host with scalar loops
(vit_image_preprocess_{bilinear,bicubic}, vit.cpp:130-287). Both resamplers
are separable linear maps of the source pixels, so the TPU-native design is
two small matmuls per channel — `W_y @ img @ W_x^T` — which XLA fuses with
the u8-rounding + mean/std normalization epilogue into one device program
(MXU does the resampling). Semantics parity with the reference:

- bilinear: half-pixel centers `sx = (x+0.5)*scale - 0.5`, floor clamped at
  0, right tap clamped at n-1 (vit.cpp:159-170); interpolated value is
  rounded to u8 (round-half-up via std::round, clamped 0..255) BEFORE
  normalizing (vit.cpp:187-191) — a real behavioral quirk we reproduce;
- bicubic: truncating source index `x = int(tx*j)`, Catmull-Rom-style cubic
  from finite differences over taps clip(x-1 .. x+2) (vit.cpp:241-284),
  same u8 re-rounding (vit.cpp:279-280);
- normalize with ImageNet mean/std m3/s3 (vit.cpp:149-150, 233-234).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (123.675, 116.280, 103.530)
IMAGENET_STD = (58.395, 57.120, 57.375)


def bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) resampling weights with the reference's bilinear
    semantics (vit.cpp:159-186), including the un-clamped fractional part
    (weights can exceed [0,1] when sx < 0)."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    for j in range(n_out):
        sx = (j + 0.5) * scale - 0.5
        x0 = max(0, int(np.floor(sx)))
        x1 = min(x0 + 1, n_in - 1)
        dx = sx - x0
        w[j, x0] += 1.0 - dx
        w[j, x1] += dx
    return w


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Per-tap weights of the reference's finite-difference cubic
    (vit.cpp:262-274): taps p0..p3 at source offsets -1..+2."""
    t2, t3 = t * t, t * t * t
    w0 = -t / 3.0 + t2 / 2.0 - t3 / 6.0
    w2 = t + t2 / 2.0 - t3 / 2.0
    w3 = -t / 6.0 + t3 / 6.0
    w1 = 1.0 - w0 - w2 - w3
    return np.stack([w0, w1, w2, w3], axis=-1)


def bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) weights with the reference's bicubic semantics:
    truncating index, taps clipped to [0, n_in-1] (vit.cpp:241-278)."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    tx = n_in / n_out
    j = np.arange(n_out)
    x = (tx * j).astype(np.int64)  # C truncation of a non-negative float
    t = tx * j - x
    taps = _cubic_weights(t.astype(np.float64)).astype(np.float32)
    for s in range(4):
        cols = np.clip(x - 1 + s, 0, n_in - 1)
        np.add.at(w, (j, cols), taps[:, s])
    return w


@lru_cache(maxsize=64)
def _resize_matrices(n_y: int, n_x: int, out_size: int, mode: str):
    if mode == "bilinear":
        wy, wx = bilinear_matrix(n_y, out_size), bilinear_matrix(n_x, out_size)
    elif mode == "bicubic":
        wy, wx = bicubic_matrix(n_y, out_size), bicubic_matrix(n_x, out_size)
    else:
        raise ValueError(f"interpolation mode '{mode}' is not supported")
    return jnp.asarray(wy), jnp.asarray(wx)


@partial(jax.jit, static_argnums=(3,))
def _resize_normalize(img_u8, wy, wx, round_u8, mean, std):
    """img_u8: (H, W, 3) uint8 -> (3, S, S) f32 normalized."""
    x = img_u8.astype(jnp.float32).transpose(2, 0, 1)  # (3, H, W)
    x = jnp.einsum(
        "oh,chw,pw->cop", wy, x, wx, preferred_element_type=jnp.float32
    )
    if round_u8:
        # reference rounds the interpolated value back to u8 (vit.cpp:187-191,
        # 279-280): round half up (std::round semantics for x >= 0 after the
        # clamp at 0), clamp to [0, 255].
        x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    return (x - mean[:, None, None]) / std[:, None, None]


def preprocess(
    img_u8: np.ndarray,
    out_size: int,
    mode: str = "bicubic",
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    round_u8: bool = True,
) -> jax.Array:
    """Host u8 HWC image -> device (3, S, S) f32, reference-parity path."""
    if img_u8.ndim != 3 or img_u8.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) u8 image, got {img_u8.shape}")
    wy, wx = _resize_matrices(img_u8.shape[0], img_u8.shape[1], out_size, mode)
    return _resize_normalize(
        jnp.asarray(img_u8),
        wy,
        wx,
        round_u8,
        jnp.asarray(mean, dtype=jnp.float32),
        jnp.asarray(std, dtype=jnp.float32),
    )
