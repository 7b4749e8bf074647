"""W8A8 int8 MXU path: channelwise requantization + dynamic activation
quant matmul (quant/int8.py, ops/pallas_int8_matmul.py).

Tolerances are loose by design — this is the explicitly-selected fast
serving path for already-quantized models, not the f16 parity path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_cpp_tpu.gguf.dtypes import GGMLDType
from vit_cpp_tpu.gguf.reader import TensorRecord
from vit_cpp_tpu.ops.pallas_int8_matmul import w8a8_matmul
from vit_cpp_tpu.quant.blocks import quantize
from vit_cpp_tpu.quant.int8 import (
    Int8Linear,
    convert_params_to_int8,
    from_quant_linear,
)
from vit_cpp_tpu.quant.qlinear import _quant_linear_from_record


def _qlinear(n, k, qt=GGMLDType.Q8_0, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.2
    blocks = quantize(w, qt)
    rec = TensorRecord("w", (n, k), qt, np.frombuffer(blocks.tobytes(), np.uint8))
    return _quant_linear_from_record(rec), w


class TestInt8Linear:
    def test_requantization_error_small(self):
        ql, w = _qlinear(128, 256)
        i8 = from_quant_linear(ql)
        assert i8.codes.dtype == jnp.int8
        assert i8.codes.shape == (256, 128)
        wd = np.asarray(i8.dequantize())
        rel = np.abs(wd - w.T) / (np.abs(w.T).max())
        assert rel.max() < 0.02  # block quant + channel requant error

    def test_matmul_close_to_f32(self):
        ql, w = _qlinear(96, 160, seed=1)
        i8 = from_quant_linear(ql)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((17, 160)),
            dtype=jnp.float32,
        )
        want = np.asarray(x) @ w.T
        scale = np.abs(want).max()
        got = np.asarray(w8a8_matmul(x, i8))
        assert np.abs(got - want).max() / scale < 0.03

    def test_zero_rows_and_padding(self):
        ql, w = _qlinear(130, 96, seed=3)  # non-multiples of tiles
        i8 = from_quant_linear(ql)
        x = np.random.default_rng(4).standard_normal((5, 96)).astype(np.float32)
        x[2] = 0.0  # all-zero token: sx == 0 path
        got = np.asarray(w8a8_matmul(jnp.asarray(x), i8))
        want = x @ w.T
        assert got.shape == (5, 130)
        np.testing.assert_allclose(got[2], 0.0)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 0.03


class TestInt8Forward:
    def test_quantized_model_forward_agrees(self, tmp_path):
        from vit_cpp_tpu.cli.quantize import quantize_model_file
        from vit_cpp_tpu.gguf import read_model
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import load_params
        from vit_cpp_tpu.models.vit import predict_probs
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=10,
            patch_size=8,
            img_size=32,
        )
        write_synthetic_model(f"{tmp_path}/m.gguf", hp, ftype=0, seed=0)
        quantize_model_file(f"{tmp_path}/m.gguf", f"{tmp_path}/q.gguf", 8, verbose=False)
        qparams = load_params(read_model(f"{tmp_path}/q.gguf"))
        iparams = convert_params_to_int8(qparams)
        # stacked block weights became Int8Linear with a leading L axis
        assert isinstance(iparams["blocks"]["qkv"]["kernel"], Int8Linear)
        assert iparams["blocks"]["qkv"]["kernel"].codes.shape == (2, 64, 192)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 3, 32, 32)),
            dtype=jnp.float32,
        )
        ref = np.asarray(predict_probs(qparams, x, hp))
        got = np.asarray(predict_probs(iparams, x, hp))
        # same top-1 and close probabilities
        assert (ref.argmax(-1) == got.argmax(-1)).all()
        np.testing.assert_allclose(got, ref, atol=0.05)

    def test_engine_mm_int8(self, tmp_path):
        from vit_cpp_tpu.cli.quantize import quantize_model_file
        from vit_cpp_tpu.engine import VitEngine
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=10,
            patch_size=8,
            img_size=32,
        )
        write_synthetic_model(f"{tmp_path}/m.gguf", hp, ftype=1, seed=5)
        quantize_model_file(f"{tmp_path}/m.gguf", f"{tmp_path}/q.gguf", 8, verbose=False)
        eng = VitEngine(f"{tmp_path}/q.gguf", mm_impl="int8", verbose=False)
        ref = VitEngine(f"{tmp_path}/q.gguf", verbose=False)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((3, 3, 32, 32)),
            dtype=jnp.float32,
        )
        a = np.asarray(eng.predict_probs_batch(x))
        b = np.asarray(ref.predict_probs_batch(x))
        assert (a.argmax(-1) == b.argmax(-1)).all()
