"""ViTSTR scene-text recognition: vocab, preprocessing and greedy decoding.

TPU-native rebuild of the reference's `extensions/vitstr.cpp` fork
(SURVEY.md C18-C20). Where the reference copy-pastes the whole engine and
edits it, here ViTSTR is just the shared ViT forward with a different head
configuration (`VitHParams.seq_len` — the 25-position sequence readout,
reference vitstr.cpp:864-901) plus three small pieces:

- the 96-token vocabulary `['[GO]', '[s]'] + string.printable[:-6]`
  (reference extensions/vitstr.cpp/convert-pth-to-ggml.py:233-235);
- grayscale preprocessing: Rec.601 luma on u8, bilinear resize with the
  reference's truncating source index and edge clamp at n-2, then
  normalize to [-1, 1] via (v/255 - 0.5) * 2 (vitstr.cpp:128-181) — on
  device, expressed as two resampling matmuls like ops/preprocess.py;
- greedy per-position decode starting at position 1, stopping at token
  id 1 == '[s]', confidence = product of the max probabilities
  (vitstr.cpp:1029-1054).
"""

from __future__ import annotations

import string
from functools import lru_cache, partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# id 0 = '[GO]' (start padding), id 1 = '[s]' (end of sequence).
VITSTR_VOCAB: List[str] = ["[GO]", "[s]"] + list(string.printable[:-6])
VITSTR_SEQ_LEN = 25
GO_ID, EOS_ID = 0, 1


def vitstr_id2label() -> Dict[int, str]:
    return dict(enumerate(VITSTR_VOCAB))


def grayscale_bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) weights of the reference's ViTSTR bilinear resampler:
    source index gx = x * (n_in/n_out) truncated, left tap clamped to
    [0, n_in-2] (vitstr.cpp:153-173). Differs from the classifier's
    half-pixel-center resampler (ops/preprocess.py)."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    for j in range(n_out):
        g = j * scale
        gi = int(g)  # C truncation, g >= 0
        u = g - gi
        p0 = max(0, min(gi, n_in - 2))
        w[j, p0] += 1.0 - u
        w[j, p0 + 1] += u
    return w


@lru_cache(maxsize=32)
def _resize_matrices(n_y: int, n_x: int, out_size: int):
    return (
        jnp.asarray(grayscale_bilinear_matrix(n_y, out_size)),
        jnp.asarray(grayscale_bilinear_matrix(n_x, out_size)),
    )


@jax.jit
def _gray_resize_normalize(gray_u8, wy, wx):
    """(H, W) gray u8 -> (1, S, S) f32 in [-1, 1]."""
    y = jnp.einsum(
        "oh,hw,pw->op",
        wy,
        gray_u8.astype(jnp.float32),
        wx,
        preferred_element_type=jnp.float32,
    )
    return ((y / 255.0 - 0.5) * 2.0)[None]


def rgb_to_grayscale(img_u8: np.ndarray) -> np.ndarray:
    """Rec.601 luma truncated to u8, in float64 like the reference's double
    arithmetic + static_cast<uint8_t> (vitstr.cpp:128-132). Runs on host:
    TPU f32 truncation disagrees with the C++ double at integer boundaries."""
    x = img_u8.astype(np.float64)
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]).astype(
        np.uint8
    )


def preprocess_grayscale(img_u8: np.ndarray, out_size: int) -> jax.Array:
    """Host u8 HWC RGB image -> device (1, S, S) f32 ViTSTR input."""
    if img_u8.ndim != 3 or img_u8.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) u8 image, got {img_u8.shape}")
    wy, wx = _resize_matrices(img_u8.shape[0], img_u8.shape[1], out_size)
    return _gray_resize_normalize(jnp.asarray(rgb_to_grayscale(img_u8)), wy, wx)


@jax.jit
def _gray_batch_resize_normalize(canvas_u8, wy, wx):
    """(B, C, C) gray u8 + (B, S, C) matrices -> (B, 1, S, S) f32."""
    y = jnp.einsum(
        "boh,bhw,bpw->bop",
        wy,
        canvas_u8.astype(jnp.float32),
        wx,
        preferred_element_type=jnp.float32,
    )
    return ((y / 255.0 - 0.5) * 2.0)[:, None]


def preprocess_grayscale_batch(images, out_size: int, canvas_step: int = 256):
    """List of (H, W, 3) u8 -> (B, 1, S, S) device batch.

    Canvas-bucketed like ops.preprocess.preprocess_batch (one compiled
    program per (B, bucket)); same per-image semantics as
    preprocess_grayscale. Zero-padded canvas pixels get zero resampling
    weight, so padding never leaks into the [-1, 1] normalize.
    """
    from vit_cpp_tpu.ops.preprocess import canvas_bucket

    if not images:
        raise ValueError("empty batch")
    canvas = max(
        canvas_bucket(i.shape[0], i.shape[1], canvas_step) for i in images
    )
    b = len(images)
    canv = np.zeros((b, canvas, canvas), dtype=np.uint8)
    wy = np.zeros((b, out_size, canvas), dtype=np.float32)
    wx = np.zeros((b, out_size, canvas), dtype=np.float32)
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        canv[i, :h, :w] = rgb_to_grayscale(img)
        wy[i, :, :h] = grayscale_bilinear_matrix(h, out_size)
        wx[i, :, :w] = grayscale_bilinear_matrix(w, out_size)
    return _gray_batch_resize_normalize(
        jnp.asarray(canv), jnp.asarray(wy), jnp.asarray(wx)
    )


def greedy_decode(
    probs: np.ndarray, id2label: Dict[int, str]
) -> Tuple[str, float]:
    """(seq_len, n_tokens) probabilities -> (text, confidence).

    Reference semantics (vitstr.cpp:1029-1051): scan positions 1.., take the
    argmax token; stop at '[s]' (id 1) without counting it; confidence is
    the product of the accepted max probabilities.
    """
    probs = np.asarray(probs)
    text, conf = [], 1.0
    for col in range(1, probs.shape[0]):
        tok = int(np.argmax(probs[col]))
        if tok == EOS_ID:
            break
        conf *= float(probs[col, tok])
        text.append(id2label.get(tok, ""))
    return "".join(text), conf


@partial(jax.jit, static_argnames=("batched",))
def greedy_decode_device(probs: jax.Array, batched: bool = True):
    """Batched on-device decode: (B, seq_len, V) probs -> token ids,
    per-position max probs and the EOS-aware validity mask.

    The host loop above is the parity path; this is the throughput path —
    token selection and the cumulative-product confidence run on the VPU,
    only (B, seq_len) int32/float32 come back to the host.
    """
    if not batched:
        probs = probs[None]
    toks = jnp.argmax(probs, axis=-1)  # (B, S)
    pmax = jnp.max(probs, axis=-1)
    toks = toks.at[:, 0].set(GO_ID)  # position 0 is never read
    is_eos = toks == EOS_ID
    # valid[b, s] == True for positions strictly before the first EOS at s>=1
    seen_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) > 0
    valid = ~seen_eos
    valid = valid.at[:, 0].set(False)
    conf = jnp.prod(jnp.where(valid, pmax, 1.0), axis=1)
    return toks, valid, conf


def decode_tokens(
    toks: np.ndarray, valid: np.ndarray, id2label: Dict[int, str]
) -> str:
    return "".join(
        id2label.get(int(t), "") for t, v in zip(toks, valid) if v
    )
