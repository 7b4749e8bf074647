"""On-device training-data augmentation for classifier fine-tuning.

The reference is inference-only (SURVEY.md §0); the fine-tune loop this
build adds (finetune.py) needs the standard ImageNet-recipe
augmentations. TPU-first design:

- Everything runs INSIDE jit on the already-preprocessed (B, C, S, S)
  device batch: a random crop is a per-image coordinate remap resampled
  at static shapes — never a dynamic-shape slice (which would retrace)
  or a host-side PIL loop (which would serialize against the 1-core
  host).
- The resample is separable bilinear via `jnp.take_along_axis` gathers
  (two passes, four gathers over the batch) — memory-bound VPU work of
  a few reads of the batch, negligible next to a train step.
- Augmenting *normalized* pixels is exact: preprocessing is an affine
  per-channel map and bilinear resampling is linear, so resample-then-
  normalize and normalize-then-resample commute. Flips are permutations
  and commute trivially.
- Determinism: callers derive the key from (seed, global update index)
  — `jax.random.fold_in(PRNGKey(seed), update_idx)` in finetune.py — so
  a resumed run replays the exact augmentation stream of the original.

Box sampling follows torchvision's RandomResizedCrop (area fraction
uniform in `scale`, aspect ratio log-uniform in `ratio`) with one
jit-friendly divergence: instead of torchvision's 10-attempt rejection
loop + center-crop fallback, out-of-range boxes are clipped to the
image. The sampled distribution differs only for (area, ratio) corners
whose box would not fit.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def resample_axis(x: jax.Array, start: jax.Array, step: jax.Array, axis: int) -> jax.Array:
    """Per-image 1-D bilinear resample of `x` along `axis`.

    x is (B, ...); `start`/`step` are (B,) in source-pixel units. Output
    index i (same length as the source axis) samples the source at
    `start + (i + 0.5) * step - 0.5` (half-pixel centers, the resize
    convention of ops/preprocess.py), clamped to the edge.
    """
    b = x.shape[0]
    s = x.shape[axis]
    i = jnp.arange(s, dtype=jnp.float32)
    src = start[:, None] + (i[None, :] + 0.5) * step[:, None] - 0.5
    src = jnp.clip(src, 0.0, float(s - 1))
    lo = jnp.floor(src)
    frac = src - lo
    lo = lo.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, s - 1)
    shape = [b] + [1] * (x.ndim - 1)
    shape[axis] = s
    a = jnp.take_along_axis(x, lo.reshape(shape), axis=axis)
    c = jnp.take_along_axis(x, hi.reshape(shape), axis=axis)
    return a + frac.reshape(shape).astype(x.dtype) * (c - a)


def crop_boxes(
    key: jax.Array,
    batch: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample (y0, x0, h, w) crop boxes in [0, 1] image fractions."""
    ka, kr, ky, kx = jax.random.split(key, 4)
    area = jax.random.uniform(ka, (batch,), minval=scale[0], maxval=scale[1])
    logr = jax.random.uniform(
        kr, (batch,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])
    )
    r = jnp.exp(logr)
    w = jnp.clip(jnp.sqrt(area * r), 0.0, 1.0)
    h = jnp.clip(jnp.sqrt(area / r), 0.0, 1.0)
    y0 = jax.random.uniform(ky, (batch,)) * (1.0 - h)
    x0 = jax.random.uniform(kx, (batch,)) * (1.0 - w)
    return y0, x0, h, w


def random_resized_crop(
    key: jax.Array,
    x: jax.Array,
    scale: Tuple[float, float] = (0.67, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jax.Array:
    """Per-image random crop resampled back to the input size.

    x is (B, C, S, S). With scale == ratio == (1, 1) the sampled box is
    the whole image and the resample is an exact identity (integer
    source coordinates, zero interpolation weight) — pinned by test.
    """
    b, _, s, _ = x.shape
    y0, x0, h, w = crop_boxes(key, b, scale, ratio)
    # crop spans h*S source rows mapped onto S output rows -> step = h
    out = resample_axis(x, y0 * s, h, axis=2)
    return resample_axis(out, x0 * s, w, axis=3)


def random_hflip(key: jax.Array, x: jax.Array) -> jax.Array:
    """Mirror each image left-right with probability 1/2."""
    flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], x[..., ::-1], x)


@functools.partial(
    jax.jit, static_argnames=("flip", "crop", "scale", "ratio")
)
def augment_batch(
    key: jax.Array,
    x: jax.Array,
    *,
    flip: bool = True,
    crop: bool = True,
    scale: Tuple[float, float] = (0.67, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jax.Array:
    """Apply the enabled augmentations to a (B, C, S, S) batch."""
    kc, kf = jax.random.split(key)
    if crop:
        x = random_resized_crop(kc, x, scale=scale, ratio=ratio)
    if flip:
        x = random_hflip(kf, x)
    return x


@functools.partial(jax.jit, static_argnames=("alpha",))
def mixup_batch(key: jax.Array, x: jax.Array, alpha: float):
    """Per-batch mixup (Zhang et al. 2017, the standard one-lambda form):
    draw lam ~ Beta(alpha, alpha), mix each image with a permuted partner
    `lam * x + (1 - lam) * x[perm]`, and return (mixed, perm, lam) so the
    caller can form the mixed loss `lam * CE(y) + (1-lam) * CE(y[perm])`.
    lam is folded toward the majority side (`max(lam, 1-lam)`) so the
    un-permuted labels always carry the dominant weight — makes val-time
    behavior insensitive to Beta's symmetry."""
    kl, kp = jax.random.split(key)
    lam = jax.random.beta(kl, alpha, alpha)
    lam = jnp.maximum(lam, 1.0 - lam)
    perm = jax.random.permutation(kp, x.shape[0])
    mixed = lam * x + (1.0 - lam) * x[perm]
    return mixed.astype(x.dtype), perm, lam


AUGMENT_MODES = ("none", "flip", "crop", "all")


def augment_flags(mode: str) -> Tuple[bool, bool]:
    """CLI mode string -> (flip, crop) booleans."""
    if mode not in AUGMENT_MODES:
        raise ValueError(
            f"augment must be one of {AUGMENT_MODES}, got {mode!r}"
        )
    return mode in ("flip", "all"), mode in ("crop", "all")
