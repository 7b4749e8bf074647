"""Round-trip and byte-layout tests for the legacy-ggml model file format
(SURVEY.md §2.3)."""

import struct

import numpy as np
import pytest

from vit_cpp_tpu.gguf import GGMLDType, read_model, write_model
from vit_cpp_tpu.gguf.dtypes import GGML_FILE_MAGIC
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import (
    random_state_dict,
    state_dict_records,
    state_dict_shapes,
    write_synthetic_model,
)

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=10,
    patch_size=8,
    img_size=32,
)


def test_header_bytes(tmp_path):
    path = str(tmp_path / "m.gguf")
    write_model(path, TINY, {0: "cat", 1: "dog"}, [], ftype=1)
    raw = open(path, "rb").read()
    ints = struct.unpack("<9i", raw[:36])
    assert ints[0] == GGML_FILE_MAGIC
    assert ints[1:7] == (64, 2, 2, 10, 8, 32)
    assert ints[7] == 1  # ftype
    assert ints[8] == 2  # num_labels
    # first label record: key=0, len=3, 'cat'
    key, ln = struct.unpack("<2i", raw[36:44])
    assert (key, ln) == (0, 3)
    assert raw[44:47] == b"cat"


def test_tensor_record_layout(tmp_path):
    path = str(tmp_path / "m.gguf")
    t = np.arange(6, dtype=np.float32).reshape(2, 3)
    write_model(path, TINY, {}, [("x.weight", (2, 3), GGMLDType.F32, t)], ftype=0)
    raw = open(path, "rb").read()
    off = 36  # header with 0 labels = 9 ints
    n_dims, name_len, dt = struct.unpack_from("<3i", raw, off)
    assert (n_dims, name_len, dt) == (2, 8, 0)
    ne = struct.unpack_from("<2i", raw, off + 12)
    assert ne == (3, 2)  # reversed torch shape: ne[0] = fastest dim
    assert raw[off + 20 : off + 28] == b"x.weight"
    vals = np.frombuffer(raw[off + 28 : off + 52], dtype="<f4")
    np.testing.assert_array_equal(vals, t.reshape(-1))


@pytest.mark.parametrize("ftype", [0, 1])
def test_synthetic_roundtrip(tmp_path, ftype):
    path = str(tmp_path / "m.gguf")
    state = write_synthetic_model(path, TINY, ftype=ftype, seed=0)
    mf = read_model(path)
    assert mf.hparams.hidden_size == 64
    assert mf.hparams.ftype == ftype
    assert len(mf.id2label) == 10
    assert len(mf.tensors) == TINY.expected_tensor_count()
    for name, arr in state.items():
        rec = mf.tensors[name]
        assert rec.shape == arr.shape
        got = rec.as_f32()
        if rec.dtype == GGMLDType.F16:
            np.testing.assert_allclose(got, arr, rtol=1e-3, atol=1e-4)
        else:
            np.testing.assert_array_equal(got, arr)


def test_converter_dtype_rules():
    shapes = state_dict_shapes(TINY)
    state = random_state_dict(TINY)
    recs = {n: dt for n, _, dt, _ in state_dict_records(state, ftype=1)}
    assert recs["pos_embed"] == GGMLDType.F32
    assert recs["cls_token"] == GGMLDType.F32
    assert recs["patch_embed.proj.weight"] == GGMLDType.F16
    assert recs["blocks.0.attn.qkv.weight"] == GGMLDType.F16
    assert recs["blocks.0.norm1.weight"] == GGMLDType.F32  # 1-D stays f32
    assert shapes["patch_embed.proj.bias"] == (1, 64, 1, 1)


def test_quantized_roundtrip(tmp_path):
    from vit_cpp_tpu.quant import blocks as qb

    path = str(tmp_path / "q.gguf")
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    packed = qb.quantize(w, GGMLDType.Q8_0)
    write_model(
        path, TINY, {}, [("w.weight", (8, 64), GGMLDType.Q8_0, packed)], ftype=8
    )
    mf = read_model(path)
    rec = mf.tensors["w.weight"]
    assert rec.dtype == GGMLDType.Q8_0
    np.testing.assert_allclose(rec.as_f32(), w, atol=0.02)


def test_bad_magic(tmp_path):
    path = str(tmp_path / "bad.gguf")
    open(path, "wb").write(b"\x00" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        read_model(path)


def test_qntvr_split(tmp_path):
    # loader splits qntvr out of ftype: ftype = qntvr*1000 + base (vit.cpp:343)
    path = str(tmp_path / "m.gguf")
    write_model(path, TINY, {}, [], ftype=2002)
    mf = read_model(path)
    assert mf.qntvr == 2
    assert mf.hparams.ftype == 2
