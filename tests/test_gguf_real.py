"""Real-GGUF container: write/read round trip + transparent engine loading.

The reference writes the legacy ggml layout under a .gguf name (SURVEY.md
§1 L3); gguf_real.py adds the actual GGUF v3 container and gguf.read_model
dispatches on the magic, so both containers load identically.
"""

import numpy as np

from vit_cpp_tpu.gguf.dtypes import GGMLDType
from vit_cpp_tpu.gguf.gguf_real import read_gguf_raw, write_gguf
from vit_cpp_tpu.gguf.reader import read_model
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import load_params
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.synthetic import (
    random_state_dict,
    state_dict_records,
    write_synthetic_model,
)


def _hp():
    return VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=6,
        patch_size=8,
        img_size=32,
    )


def test_raw_round_trip(tmp_path):
    hp = _hp()
    state = random_state_dict(hp, seed=0)
    path = tmp_path / "m.gguf"
    id2label = {i: f"c{i}" for i in range(6)}
    write_gguf(
        str(path),
        hp,
        id2label,
        state_dict_records(state, ftype=1),
        ftype=1,
        extra_metadata={"test.note": "hello", "test.flag": True, "test.n": 7},
    )
    meta, tensors = read_gguf_raw(str(path))
    assert meta["general.architecture"] == "vit"
    assert meta["vit.hidden_size"] == 64
    assert meta["vit.id2label"] == [f"c{i}" for i in range(6)]
    assert meta["test.note"] == "hello"
    assert meta["test.flag"] is True
    assert meta["test.n"] == 7
    names = {n for n, *_ in tensors}
    assert "blocks.1.mlp.fc2.weight" in names
    # f16 payload round-trips bit-exact
    for name, shape, dtype, raw in tensors:
        if name == "norm.weight":
            got = np.frombuffer(raw, "<f4")
            np.testing.assert_array_equal(got, state[name])


def test_read_model_dispatch_and_forward_parity(tmp_path):
    hp = _hp()
    legacy = tmp_path / "legacy.gguf"
    state = write_synthetic_model(str(legacy), hp, ftype=1, seed=1)
    real = tmp_path / "real.gguf"
    write_gguf(
        str(real),
        hp,
        {i: f"LABEL_{i}" for i in range(6)},
        state_dict_records(state, ftype=1),
        ftype=1,
    )
    mf_l = read_model(str(legacy))
    mf_r = read_model(str(real))
    assert mf_r.hparams == mf_l.hparams
    assert mf_r.id2label == mf_l.id2label
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    a = np.asarray(forward(load_params(mf_l), x, hp))
    b = np.asarray(forward(load_params(mf_r), x, hp))
    np.testing.assert_array_equal(a, b)


def test_quantized_tensors_in_gguf(tmp_path):
    from vit_cpp_tpu.quant.blocks import dequantize, quantize

    hp = _hp()
    state = random_state_dict(hp, seed=2)
    rows = []
    for name, shape, dtype, payload in state_dict_records(state, ftype=0):
        if name == "head.weight":
            blocks = quantize(payload, GGMLDType.Q8_0)
            rows.append((name, shape, GGMLDType.Q8_0, blocks.tobytes()))
        else:
            rows.append((name, shape, dtype, payload))
    path = tmp_path / "q.gguf"
    write_gguf(str(path), hp, {}, rows, ftype=8)
    mf = read_model(str(path))
    rec = mf.tensors["head.weight"]
    assert rec.dtype == GGMLDType.Q8_0
    want = dequantize(
        quantize(state["head.weight"], GGMLDType.Q8_0),
        state["head.weight"].size,
        GGMLDType.Q8_0,
    ).reshape(rec.shape)
    np.testing.assert_allclose(rec.as_f32(), want)


def test_quantize_accepts_real_gguf_input(tmp_path):
    """The quantize tool must read either container (read_model dispatch)
    and produce a loadable quantized file."""
    import numpy as np

    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.models.vit import forward

    hp = _hp()
    state = random_state_dict(hp, seed=3)
    src = tmp_path / "real.gguf"
    write_gguf(
        str(src),
        hp,
        {i: f"L{i}" for i in range(hp.num_classes)},
        state_dict_records(state, ftype=1),
        ftype=1,
    )
    out = tmp_path / "q8.gguf"
    assert quantize_model_file(str(src), str(out), 8, verbose=False)
    import dataclasses

    mf = read_model(str(out))
    assert mf.hparams.ftype == 8  # quantize rewrites file ftype := itype
    assert dataclasses.replace(mf.hparams, ftype=1) == read_model(str(src)).hparams
    params = load_params(mf)
    x = np.random.default_rng(0).standard_normal((1, 3, 32, 32)).astype(np.float32)
    ref = np.asarray(forward(load_params(read_model(str(src))), x, hp))
    got = np.asarray(forward(params, x, hp))
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_fuzz_single_byte_corruptions(tmp_path):
    """Corruption robustness parity with the legacy reader's fuzz test:
    every single-byte corruption of a real v3 container either still
    loads or fails with a clean ValueError/decode error — never a hang,
    a multi-GB allocation, ZeroDivisionError (alignment=0), int64
    overflow on dims, or RecursionError (nested metadata arrays)."""
    import struct

    hp = _hp()
    state = random_state_dict(hp, seed=3)
    path = tmp_path / "m.gguf"
    write_gguf(
        str(path),
        hp,
        {i: f"L{i}" for i in range(6)},
        state_dict_records(state, ftype=1),
        ftype=1,
    )
    data = bytearray(path.read_bytes())
    rng = np.random.default_rng(0)
    offsets = set(rng.integers(0, len(data), 120).tolist())
    offsets.update(range(0, 96, 4))  # header + first KV fields
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
        except (ValueError, UnicodeDecodeError):
            clean_fail += 1
    assert ok + clean_fail == len(offsets)
    assert clean_fail > 0 and ok > 0
