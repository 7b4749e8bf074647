"""LayerNorm-affine folding (models/fold.py): folded forward == unfolded.

gamma/beta fold into qkv/fc1/head weights+biases; the LN nodes keep only
pure normalization. Must hold for dense, quantized (via int8 requant) and
the engine fold_ln flag.
"""

import numpy as np

import jax.numpy as jnp

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.fold import fold_layernorms
from vit_cpp_tpu.models.vit import forward, predict_probs
from vit_cpp_tpu.testing.synthetic import random_state_dict


def _hp():
    return VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=10,
        patch_size=8,
        img_size=32,
    )


def test_folded_matches_unfolded_dense():
    hp = _hp()
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
    folded = fold_layernorms(params)
    assert folded["blocks"]["ln1"]["scale"] is None
    assert folded["norm"]["scale"] is None
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3, 32, 32)),
        dtype=jnp.float32,
    )
    a = np.asarray(forward(params, x, hp))
    b = np.asarray(forward(folded, x, hp))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_folded_matches_unfolded_int8(tmp_path):
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = _hp()
    write_synthetic_model(f"{tmp_path}/m.gguf", hp, ftype=1, seed=2)
    quantize_model_file(f"{tmp_path}/m.gguf", f"{tmp_path}/q.gguf", 8, verbose=False)
    iparams = convert_params_to_int8(load_params(read_model(f"{tmp_path}/q.gguf")))
    folded = fold_layernorms(iparams)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 3, 32, 32)),
        dtype=jnp.float32,
    )
    a = np.asarray(predict_probs(iparams, x, hp))
    b = np.asarray(predict_probs(folded, x, hp))
    assert (a.argmax(-1) == b.argmax(-1)).all()
    np.testing.assert_allclose(a, b, atol=0.03)


def test_engine_fold_ln(tmp_path):
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = _hp()
    write_synthetic_model(f"{tmp_path}/m.gguf", hp, ftype=1, seed=4)
    ref = VitEngine(f"{tmp_path}/m.gguf", verbose=False)
    eng = VitEngine(f"{tmp_path}/m.gguf", fold_ln=True, verbose=False)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((3, 3, 32, 32)),
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(eng.predict_probs_batch(x)),
        np.asarray(ref.predict_probs_batch(x)),
        atol=1e-4,
    )


def test_fold_quantlinear_respects_mm_impl(tmp_path):
    """fold_ln on a block-quantized tree must NOT silently move matmuls to
    the int8 path when the caller selected a non-int8 implementation
    (ADVICE r1): with mm_impl != int8 the folded kernels become dense."""
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.quant.int8 import Int8Linear
    from vit_cpp_tpu.quant.qlinear import QuantLinear
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = _hp()
    write_synthetic_model(f"{tmp_path}/m.gguf", hp, ftype=1, seed=4)
    quantize_model_file(f"{tmp_path}/m.gguf", f"{tmp_path}/q.gguf", 8, verbose=False)
    qparams = load_params(read_model(f"{tmp_path}/q.gguf"))
    assert isinstance(qparams["blocks"]["qkv"]["kernel"], QuantLinear)

    dense_folded = fold_layernorms(qparams, mm_impl="pallas")
    assert isinstance(dense_folded["blocks"]["qkv"]["kernel"], jnp.ndarray)
    assert not isinstance(dense_folded["head"]["kernel"], (QuantLinear, Int8Linear))

    int8_folded = fold_layernorms(qparams, mm_impl="int8")
    assert isinstance(int8_folded["blocks"]["qkv"]["kernel"], Int8Linear)

    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 3, 32, 32)),
        dtype=jnp.float32,
    )
    a = np.asarray(predict_probs(qparams, x, hp, mm_impl="pallas"))
    b = np.asarray(predict_probs(dense_folded, x, hp))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
