"""Forward-pass parity tests: JAX forward vs independent numpy oracle, plus
file-loaded (f16 and quantized) variants. Mirrors SURVEY.md §4's prescribed
golden-logit strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cpp_tpu.gguf import GGMLDType, read_model
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import forward, load_params, params_from_state_dict, predict_probs
from vit_cpp_tpu.testing.ref_numpy import forward_numpy, probs_numpy
from vit_cpp_tpu.testing.synthetic import random_state_dict, write_synthetic_model

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_classes=16,
    patch_size=8,
    img_size=32,
)


@pytest.fixture(scope="module")
def tiny_setup():
    state = random_state_dict(TINY, seed=7)
    rng = np.random.default_rng(3)
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    golden = forward_numpy(state, TINY, images)
    return state, images, golden


def test_forward_matches_numpy_oracle(tiny_setup):
    state, images, golden = tiny_setup
    params = params_from_state_dict(state, TINY)
    logits = forward(params, jnp.asarray(images), TINY)
    assert logits.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(logits), golden, atol=2e-4, rtol=1e-4)


def test_probs_sum_to_one(tiny_setup):
    state, images, golden = tiny_setup
    params = params_from_state_dict(state, TINY)
    probs = predict_probs(params, jnp.asarray(images), TINY)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(probs), probs_numpy(state, TINY, images), atol=1e-5
    )


def test_forward_jits_once_for_any_batch(tiny_setup):
    state, images, _ = tiny_setup
    params = params_from_state_dict(state, TINY)
    fn = jax.jit(forward, static_argnums=2)
    a = fn(params, jnp.asarray(images), TINY)
    b = fn(params, jnp.asarray(images[:1]), TINY)
    np.testing.assert_allclose(np.asarray(a[:1]), np.asarray(b), atol=1e-5)


def test_forward_from_f16_file(tmp_path, tiny_setup):
    state, images, golden = tiny_setup
    path = str(tmp_path / "m.gguf")
    write_synthetic_model(path, TINY, ftype=1, seed=7)
    params = load_params(read_model(path))
    logits = forward(params, jnp.asarray(images), TINY)
    # f16 weight storage error budget (reference f16 parity target is 1e-3
    # on top-5 logits, BASELINE.md)
    np.testing.assert_allclose(np.asarray(logits), golden, atol=2e-2, rtol=1e-2)


def test_forward_bf16(tiny_setup):
    state, images, golden = tiny_setup
    params = params_from_state_dict(state, TINY, dtype=jnp.bfloat16)
    logits = forward(params, jnp.asarray(images, dtype=jnp.bfloat16), TINY)
    assert logits.dtype == jnp.bfloat16
    # bf16 has ~3 decimal digits; check ordering-level agreement
    top1 = np.asarray(logits.astype(jnp.float32)).argmax(-1)
    assert (top1 == golden.argmax(-1)).all()


@pytest.mark.parametrize("itype", [8, 2, 7])
def test_forward_quantized_file(tmp_path, tiny_setup, itype):
    from vit_cpp_tpu.cli.quantize import quantize_model_file

    state, images, golden = tiny_setup
    f16 = str(tmp_path / "f16.gguf")
    qf = str(tmp_path / "q.gguf")
    write_synthetic_model(f16, TINY, ftype=1, seed=7)
    quantize_model_file(f16, qf, itype, verbose=False)

    mf = read_model(qf)
    assert mf.hparams.ftype == itype
    params = load_params(mf)
    # 2-D .*weight tensors must be packed QuantLinear nodes, biases dense
    from vit_cpp_tpu.models import QuantLinear

    assert isinstance(params["blocks"]["qkv"]["kernel"], QuantLinear)
    assert isinstance(params["head"]["kernel"], QuantLinear)
    assert not isinstance(params["patch_embed"]["kernel"], QuantLinear)

    logits = forward(params, jnp.asarray(images), TINY)
    # Quantization noise on *random* (untrained) weights in a 64-dim model is
    # the worst case — thresholds scale with bit width (trained checkpoints
    # correlate far tighter; see quant codec error-bound tests for the real
    # contract).
    min_corr = {2: 0.93, 7: 0.98, 8: 0.999}[itype]
    assert np.corrcoef(np.asarray(logits).ravel(), golden.ravel())[0, 1] > min_corr


def test_vitstr_sequence_head(tiny_setup):
    state, images, _ = tiny_setup
    hp = VitHParams(**{**TINY.__dict__, "seq_len": 5})
    params = params_from_state_dict(state, hp)
    logits = forward(params, jnp.asarray(images), hp)
    assert logits.shape == (2, 5, 16)
    golden = forward_numpy(state, hp, images)
    np.testing.assert_allclose(np.asarray(logits), golden, atol=2e-4, rtol=1e-4)


def test_forward_debug_stage_capture(tiny_setup):
    """forward_debug (the print_t_f32 analogue, SURVEY.md §4.5) captures
    every stage and agrees with the scan-based forward."""
    import numpy as np

    from vit_cpp_tpu.models.vit import forward, forward_debug, print_t

    from vit_cpp_tpu.models import params_from_state_dict

    state, images, golden = tiny_setup
    params = params_from_state_dict(state, TINY)
    acts = forward_debug(params, images, TINY)
    assert set(acts) >= {"embed", "block_0", "pooled", "logits", "probs"}
    assert f"block_{TINY.num_hidden_layers - 1}" in acts
    np.testing.assert_allclose(
        np.asarray(acts["logits"]),
        np.asarray(forward(params, images, TINY)),
        atol=1e-5,
    )
    # stage capture agrees with the float64 oracle end to end
    np.testing.assert_allclose(np.asarray(acts["logits"]), golden, atol=1e-3)
    print_t("embed", acts["embed"])  # smoke: console dump shape


def test_forward_features_is_the_pooled_stage(tiny_setup):
    """forward(features=True) returns the final-LN pooled representation —
    exactly forward_debug's 'pooled' stage (the vit_encode_image encoder
    output, vit.cpp:903-920) — with the head never applied."""
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.vit import forward, forward_debug

    state, images, _ = tiny_setup
    params = params_from_state_dict(state, TINY)
    feats = forward(params, jnp.asarray(images), TINY, features=True)
    assert feats.shape == (2, TINY.hidden_size)
    acts = forward_debug(params, images, TINY)
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(acts["pooled"]), atol=1e-5
    )
