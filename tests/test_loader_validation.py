"""Loader strictness parity with the reference's validations.

vit_model_load rejects: unknown tensor names (vit.cpp:618-622), element
count mismatches (:627-632), per-dim shape mismatches (:634-641), 64-
misaligned quantized rows (:655-671), truncated data (:680-685) and a
wrong final tensor count (:697-701). The pytree builder + reader must
fail the same ways, with clear messages.
"""

import struct

import numpy as np
import pytest

from vit_cpp_tpu.gguf.dtypes import GGMLDType
from vit_cpp_tpu.gguf.reader import read_model
from vit_cpp_tpu.gguf.writer import write_header, write_tensor
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import load_params
from vit_cpp_tpu.testing.synthetic import (
    random_state_dict,
    state_dict_records,
    write_synthetic_model,
)


def _hp():
    return VitHParams(
        hidden_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_classes=4,
        patch_size=8,
        img_size=16,
    )


def _write(path, hp, records, ftype=0):
    with open(path, "wb") as f:
        write_header(f, hp, {}, ftype)
        for name, shape, dt, payload in records:
            write_tensor(f, name, shape, dt, payload)


def test_unknown_tensor_rejected(tmp_path):
    hp = _hp()
    state = random_state_dict(hp, seed=0)
    state["blocks.0.attn.bogus.weight"] = np.zeros((4, 4), np.float32)
    p = tmp_path / "m.gguf"
    _write(p, hp, state_dict_records(state, 0))
    with pytest.raises(ValueError, match="unexpected tensors"):
        load_params(read_model(str(p)))


def test_missing_tensor_rejected(tmp_path):
    hp = _hp()
    state = random_state_dict(hp, seed=0)
    del state["norm.bias"]
    p = tmp_path / "m.gguf"
    _write(p, hp, state_dict_records(state, 0))
    with pytest.raises(ValueError, match="norm.bias"):
        load_params(read_model(str(p)))


def test_shape_mismatch_rejected(tmp_path):
    hp = _hp()
    state = random_state_dict(hp, seed=0)
    state["blocks.0.attn.qkv.weight"] = np.zeros((192, 32), np.float32)
    p = tmp_path / "m.gguf"
    _write(p, hp, state_dict_records(state, 0))
    with pytest.raises(ValueError, match="attn.qkv.weight"):
        load_params(read_model(str(p)))


def test_truncated_tensor_data_rejected(tmp_path):
    hp = _hp()
    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), hp, ftype=0, seed=0)
    data = p.read_bytes()
    p.write_bytes(data[:-100])
    with pytest.raises(ValueError, match="truncated"):
        read_model(str(p))


def test_misaligned_quantized_row_rejected(tmp_path):
    # ne[0] % 64 != 0 for a quant dtype must be rejected (vit.cpp:655-671,
    # stricter than the 32-elem block, preserved deliberately)
    hp = _hp()
    p = tmp_path / "m.gguf"
    with open(p, "wb") as f:
        write_header(f, hp, {}, ftype=8)
        # 96 % 64 != 0 -> header says Q8_0 with ne[0]=96
        f.write(struct.pack("<iii", 2, len(b"w"), int(GGMLDType.Q8_0)))
        f.write(struct.pack("<ii", 96, 2))  # reversed dims: ne0=96
        f.write(b"w")
        f.write(b"\x00" * GGMLDType.Q8_0.row_bytes(192))
    with pytest.raises(ValueError, match="64-aligned"):
        read_model(str(p))


def test_duplicate_tensor_rejected(tmp_path):
    hp = _hp()
    state = random_state_dict(hp, seed=0)
    recs = list(state_dict_records(state, 0))
    p = tmp_path / "m.gguf"
    _write(p, hp, recs + [recs[0]])
    with pytest.raises(ValueError, match="duplicate"):
        read_model(str(p))


def test_fuzz_single_byte_corruptions(tmp_path):
    """Harness-grade robustness: any single-byte corruption of a model
    file must either still load (payload bytes — values change, structure
    does not) or fail with a clean, typed error — never an unhandled
    crash. Mirrors the spirit of the reference's fail-fast loader checks
    (vit.cpp:618-701) at every byte offset class: magic, hparams, label
    table, record headers, names, payloads, EOF."""
    hp = _hp()
    path = tmp_path / "m.gguf"
    write_synthetic_model(str(path), hp, ftype=1, seed=0)
    data = bytearray(path.read_bytes())
    rng = np.random.default_rng(0)
    offsets = set(rng.integers(0, len(data), 120).tolist())
    offsets.update(range(0, 64, 4))  # every header field start
    ok = clean_fail = 0
    for off in sorted(offsets):
        corrupted = bytearray(data)
        corrupted[off] ^= 0xA5
        p = tmp_path / "fuzz.gguf"
        p.write_bytes(corrupted)
        try:
            mf = read_model(str(p))
            load_params(mf)
            ok += 1
        except (ValueError, OSError, struct.error, UnicodeDecodeError,
                EOFError, MemoryError):
            clean_fail += 1
    assert ok + clean_fail == len(offsets)
    # payload corruptions should mostly load; structural ones must fail
    assert clean_fail > 0 and ok > 0


def test_non_4x_mlp_inferred_from_fc1_shape(tmp_path):
    """ViT-g-family checkpoints (MLP != 4x hidden; the original paper's
    48/11 ratio) carry their width only in the fc1 tensor shape — the
    legacy hparam block has no MLP field. The loader must infer it and
    the forward must match an explicit-hparams build bit for bit."""
    import jax.numpy as jnp

    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.vit import forward

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=4,
        patch_size=8,
        img_size=16,
        mlp_hidden=176,  # 64 * 11/4 -> deliberately not 4x
    )
    state = random_state_dict(hp, seed=3)
    assert state["blocks.0.mlp.fc1.weight"].shape == (176, 64)
    p = tmp_path / "g.gguf"
    write_synthetic_model(str(p), hp, ftype=0, seed=3)

    # load WITHOUT hparams: the file's hparam block says nothing about MLP
    mf = read_model(str(p))
    assert mf.hparams.mlp_hidden is None
    params = load_params(mf)
    assert params["blocks"]["fc1"]["kernel"].shape == (2, 64, 176)
    assert params["blocks"]["fc2"]["kernel"].shape == (2, 176, 64)

    ref = params_from_state_dict(state, hp)
    x = np.asarray(
        np.random.default_rng(0).normal(size=(1, 3, 16, 16)), np.float32
    )
    got = forward(params, jnp.asarray(x), mf.hparams)
    want = forward(ref, jnp.asarray(x), hp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_mlp_width_mismatch_with_explicit_hparams_rejected(tmp_path):
    """An EXPLICIT mlp_hidden that contradicts the tensors must still fail
    the strict shape check (no silent inference override)."""
    hp = _hp()
    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), hp, ftype=0, seed=0)
    import dataclasses

    bad = dataclasses.replace(hp, mlp_hidden=192)
    with pytest.raises(ValueError, match="mlp.fc1.weight"):
        load_params(read_model(str(p)), hparams=bad)
