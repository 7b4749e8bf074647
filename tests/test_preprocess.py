"""Preprocessing parity: matmul-based device resamplers vs the scalar-loop
oracles re-expressing the reference algorithms (vit.cpp:130-287)."""

import numpy as np
import pytest

from vit_cpp_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    bicubic_matrix,
    bilinear_matrix,
    preprocess,
)
from vit_cpp_tpu.testing.ref_preprocess import bicubic_loop, bilinear_loop


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("hw", [(64, 48), (24, 24), (100, 37)])
def test_matches_scalar_oracle(mode, hw):
    img = _rand_img(*hw, seed=1)
    target = 32
    got = np.asarray(preprocess(img, target, mode=mode))
    ref = (bilinear_loop if mode == "bilinear" else bicubic_loop)(img, target)
    assert got.shape == (3, 32, 32)
    # identical after u8 re-rounding except at exact .5 ties from float
    # association order; allow a tiny fraction of one-LSB differences
    diff = np.abs(got - ref)
    lsb = 1.0 / min(IMAGENET_STD)  # one u8 step after normalize
    assert diff.max() <= lsb + 1e-5
    assert (diff > 1e-5).mean() < 0.01


def test_rows_sum_to_one():
    for m in (bilinear_matrix(57, 32), bicubic_matrix(57, 32),
              bilinear_matrix(16, 32), bicubic_matrix(16, 32)):
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_identity_resize():
    # same-size bicubic: tx=1, x=j, dx=0 => pure identity taps
    img = _rand_img(32, 32, seed=2)
    got = np.asarray(preprocess(img, 32, mode="bicubic"))
    expect = (img.astype(np.float32).transpose(2, 0, 1)
              - np.array(IMAGENET_MEAN)[:, None, None]) / np.array(IMAGENET_STD)[:, None, None]
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_normalization_constants():
    # ImageNet mean/std of the reference (vit.cpp:149-150) — a deliberate
    # reference quirk (augreg weights actually expect 0.5/0.5, SURVEY.md §2.5)
    assert IMAGENET_MEAN == (123.675, 116.280, 103.530)
    assert IMAGENET_STD == (58.395, 57.120, 57.375)


def test_bad_mode_raises():
    with pytest.raises(ValueError, match="not supported"):
        preprocess(_rand_img(8, 8), 8, mode="nearest")


def test_bad_shape_raises():
    with pytest.raises(ValueError, match="expected"):
        preprocess(np.zeros((8, 8), np.uint8), 8)
