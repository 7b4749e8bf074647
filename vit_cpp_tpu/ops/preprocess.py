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
# SigLIP-style [-1, 1] normalization: (v/255 - 0.5)/0.5 == (v - 127.5)/127.5
# (transformers SiglipImageProcessor image_mean/std = 0.5)
UNIT_MEAN = (127.5, 127.5, 127.5)
UNIT_STD = (127.5, 127.5, 127.5)
# OpenAI CLIP's processor constants (transformers CLIPImageProcessor):
# mean/std * 255
CLIP_MEAN = (255 * 0.48145466, 255 * 0.4578275, 255 * 0.40821073)
CLIP_STD = (255 * 0.26862954, 255 * 0.26130258, 255 * 0.27577711)


def norm_constants(pixel_norm: str):
    """(mean, std) for an hparams.pixel_norm value."""
    if pixel_norm == "imagenet":
        return IMAGENET_MEAN, IMAGENET_STD
    if pixel_norm == "unit":
        return UNIT_MEAN, UNIT_STD
    if pixel_norm == "clip":
        return CLIP_MEAN, CLIP_STD
    raise ValueError(
        f"pixel_norm must be imagenet|unit|clip, got {pixel_norm!r}"
    )


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


# ---------------------------------------------------------------------------
# Throughput path: batched, canvas-bucketed preprocessing.
#
# The parity path above jits one program per source (H, W) — fine for a CLI,
# hostile to serving where every image has a different size (each size would
# recompile; the XLA analogue of the reference rebuilding its graph per
# image, which SURVEY.md §7 forbids). Here sources are zero-padded onto a
# bucketed square canvas and the per-image resampling matrices become
# *inputs* (zero past the true extent), so one compiled program per
# (batch, canvas-bucket) handles every image size, and the whole batch is
# one einsum on the MXU.
# ---------------------------------------------------------------------------


def canvas_bucket(h: int, w: int, step: int = 256) -> int:
    """Smallest multiple of `step` covering both extents."""
    m = max(h, w, 1)
    return (m + step - 1) // step * step


@lru_cache(maxsize=512)
def _padded_resize_matrix(n_in: int, out_size: int, canvas: int, mode: str):
    """(out, canvas) resampling weights: true matrix in the first n_in
    columns, zeros beyond (padded canvas pixels contribute nothing)."""
    w = (
        bilinear_matrix(n_in, out_size)
        if mode == "bilinear"
        else bicubic_matrix(n_in, out_size)
    )
    out = np.zeros((out_size, canvas), dtype=np.float32)
    out[:, :n_in] = w
    return out


@partial(jax.jit, static_argnums=(3,))
def _batch_resize_normalize(canvas_u8, wy, wx, round_u8, mean, std):
    """(B, C, C, 3) u8 + per-image (B, S, C) matrices -> (B, 3, S, S)."""
    x = canvas_u8.astype(jnp.float32)
    y = jnp.einsum(
        "boh,bhwc,bpw->bcop", wy, x, wx, preferred_element_type=jnp.float32
    )
    if round_u8:
        y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)
    return (y - mean[None, :, None, None]) / std[None, :, None, None]


def preprocess_batch(
    images,
    out_size: int,
    mode: str = "bicubic",
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    round_u8: bool = True,
    canvas_step: int = 256,
) -> jax.Array:
    """List of (H, W, 3) u8 host images -> (B, 3, S, S) device batch.

    Same per-image semantics as `preprocess` (identical resampling weights,
    u8 re-rounding, mean/std); compiles once per (B, canvas-bucket).
    """
    if not images:
        raise ValueError("empty batch")
    canvas = max(canvas_bucket(i.shape[0], i.shape[1], canvas_step) for i in images)
    b = len(images)
    canv = np.zeros((b, canvas, canvas, 3), dtype=np.uint8)
    wy = np.empty((b, out_size, canvas), dtype=np.float32)
    wx = np.empty((b, out_size, canvas), dtype=np.float32)
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        canv[i, :h, :w] = img
        wy[i] = _padded_resize_matrix(h, out_size, canvas, mode)
        wx[i] = _padded_resize_matrix(w, out_size, canvas, mode)
    return _batch_resize_normalize(
        jnp.asarray(canv),
        jnp.asarray(wy),
        jnp.asarray(wx),
        round_u8,
        jnp.asarray(mean, dtype=jnp.float32),
        jnp.asarray(std, dtype=jnp.float32),
    )
