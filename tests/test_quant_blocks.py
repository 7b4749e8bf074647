"""Unit tests for the ggml block-quantization codecs (SURVEY.md §2.2)."""

import numpy as np
import pytest

from vit_cpp_tpu.gguf.dtypes import QK, GGMLDType
from vit_cpp_tpu.quant import blocks

QTYPES = [
    GGMLDType.Q4_0,
    GGMLDType.Q4_1,
    GGMLDType.Q5_0,
    GGMLDType.Q5_1,
    GGMLDType.Q8_0,
]

# Max reconstruction error in units of the per-block quantization step.
# Rounding is ggml's round-half-up => error <= step/2, except the symmetric
# formats (Q4_0/Q5_0) clamp the top code (e.g. x*id = +8 -> code 15), which
# can cost a full step on the side opposite the block's signed max.
_STEP_FRACTION = {
    GGMLDType.Q4_0: 1.01,
    GGMLDType.Q5_0: 1.01,
    GGMLDType.Q4_1: 0.51,
    GGMLDType.Q5_1: 0.51,
    GGMLDType.Q8_0: 0.51,
}


def _max_step(x, qtype):
    xb = x.reshape(-1, QK)
    if qtype in (GGMLDType.Q4_0, GGMLDType.Q5_0):
        half = 8 if qtype == GGMLDType.Q4_0 else 16
        return np.abs(xb).max(axis=1) / half
    if qtype in (GGMLDType.Q4_1, GGMLDType.Q5_1):
        levels = 15 if qtype == GGMLDType.Q4_1 else 31
        return (xb.max(axis=1) - xb.min(axis=1)) / levels
    return np.abs(xb).max(axis=1) / 127.0


@pytest.mark.parametrize("qtype", QTYPES)
def test_roundtrip_error_bound(qtype):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4 * 1024).astype(np.float32)
    packed = blocks.quantize(x, qtype)
    y = blocks.dequantize(packed, x.size, qtype)
    err = np.abs(x - y).reshape(-1, QK).max(axis=1)
    step = _max_step(x, qtype)
    # tolerance: half a step plus f16 rounding of the scale (2^-11 relative)
    assert np.all(err <= _STEP_FRACTION[qtype] * step + 1e-2 * np.abs(step))


@pytest.mark.parametrize("qtype", QTYPES)
def test_block_byte_size(qtype):
    x = np.zeros(QK * 3, np.float32)
    packed = blocks.quantize(x, qtype)
    assert len(packed.tobytes()) == 3 * qtype.type_size
    assert qtype.row_bytes(QK * 3) == 3 * qtype.type_size


@pytest.mark.parametrize("qtype", QTYPES)
def test_codes_in_range(qtype):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(QK * 8) * 100).astype(np.float32)
    packed = blocks.quantize(x, qtype)
    soa = blocks.unpack_soa(packed, x.size, qtype)
    codes = soa["codes"]
    if qtype in (GGMLDType.Q4_0, GGMLDType.Q4_1):
        assert codes.min() >= 0 and codes.max() <= 15
    elif qtype in (GGMLDType.Q5_0, GGMLDType.Q5_1):
        assert codes.min() >= 0 and codes.max() <= 31
    else:
        assert codes.dtype == np.int8


def test_q8_0_exact_values():
    # A block where the quantization is analytically checkable.
    x = np.zeros(QK, np.float32)
    x[0] = 127.0
    x[1] = -127.0
    x[2] = 63.5  # rounds half away from zero -> 64
    packed = blocks.quantize(x, GGMLDType.Q8_0)
    soa = blocks.unpack_soa(packed, QK, GGMLDType.Q8_0)
    assert soa["d"][0] == pytest.approx(1.0)
    assert soa["codes"][0, 0] == 127
    assert soa["codes"][0, 1] == -127
    assert soa["codes"][0, 2] == 64


def test_q4_0_sign_convention():
    # The scale carries the sign of the max-|x| element (d = max / -8), so a
    # block dominated by a positive value gets a negative d.
    x = np.linspace(-1, 2, QK).astype(np.float32)
    packed = blocks.quantize(x, GGMLDType.Q4_0)
    soa = blocks.unpack_soa(packed, QK, GGMLDType.Q4_0)
    assert soa["d"][0] < 0
    y = blocks.dequantize(packed, QK, GGMLDType.Q4_0)
    assert np.abs(y - x).max() < 0.2


def test_q5_high_bits_used():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(QK * 4).astype(np.float32)
    packed = blocks.quantize(x, GGMLDType.Q5_0)
    soa = blocks.unpack_soa(packed, x.size, GGMLDType.Q5_0)
    # With 32 levels, codes above 15 must appear for gaussian data.
    assert (soa["codes"] > 15).any()
    # And the 5-bit path must beat the 4-bit path on the same data.
    e5 = np.abs(blocks.dequantize(packed, x.size, GGMLDType.Q5_0) - x).mean()
    p4 = blocks.quantize(x, GGMLDType.Q4_0)
    e4 = np.abs(blocks.dequantize(p4, x.size, GGMLDType.Q4_0) - x).mean()
    assert e5 < e4


def test_zero_block_zero_codes():
    # ggml uses id=0 when d==0 => all codes = bias, dequant exactly 0.
    x = np.zeros(QK, np.float32)
    for qtype in QTYPES:
        y = blocks.dequantize(blocks.quantize(x, qtype), QK, qtype)
        assert np.all(y == 0), qtype


def test_hist_has_16_buckets():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(QK * 32).astype(np.float32)
    for qtype in QTYPES:
        _, hist = blocks.quantize_with_hist(x, qtype)
        assert hist.shape == (16,)
        assert hist.sum() == x.size
