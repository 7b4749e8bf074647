"""DeiT-distilled and pre-norm (norm_pre) family support.

Two timm ViT branches the reference cannot serve (SURVEY.md §2.4-2.5):
models with a `norm_pre` LayerNorm (its converter SKIPS those tensors,
convert-pth-to-ggml.py:117-120, silently producing wrong outputs) and
DeiT-distilled models (`dist_token` + `head_dist`, no reference path at
all). Here both are first-class: tensor presence declares the feature
(hparams num_prefix_tokens / norm_pre), the forward averages the two
classifier heads like timm's VisionTransformerDistilled, and every
serving/production path (fold-ln, W8A8, static scales, mesh sharding,
export) carries them. Parity authority: the independent f64 numpy oracle
(testing/ref_numpy.py).
"""

import dataclasses

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.ref_numpy import forward_numpy
from vit_cpp_tpu.testing.synthetic import random_state_dict, write_synthetic_model

HP_DIST = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=10,
    patch_size=8,
    img_size=32,
    num_prefix_tokens=2,
    norm_pre=True,
)
HP_PRE = dataclasses.replace(HP_DIST, num_prefix_tokens=1)


def _images(hp, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, hp.img_size, hp.img_size)).astype(
        np.float32
    )


def test_hparams_token_accounting():
    assert HP_DIST.n_tokens == HP_DIST.n_patches + 2
    assert HP_PRE.n_tokens == HP_PRE.n_patches + 1
    # 8 base globals + 12/layer, +2 norm_pre, +3 dist_token/head_dist
    assert HP_DIST.expected_tensor_count() == 8 + 12 * 2 + 2 + 3
    assert HP_PRE.expected_tensor_count() == 8 + 12 * 2 + 2


@pytest.mark.parametrize("hp", [HP_DIST, HP_PRE], ids=["distilled", "norm_pre"])
def test_forward_matches_numpy_oracle(hp):
    state = random_state_dict(hp, seed=3)
    params = params_from_state_dict(state, hp)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    got = np.asarray(forward(params, x, hp))
    assert got.shape == (2, hp.num_classes)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_distilled_head_is_really_averaged():
    """The two heads must both contribute: zeroing head_dist must change
    the logits of a distilled model (guards against silently dropping the
    second head)."""
    state = random_state_dict(HP_DIST, seed=4)
    params = params_from_state_dict(state, HP_DIST)
    x = _images(HP_DIST)
    base = np.asarray(forward(params, x, HP_DIST))
    p2 = dict(params)
    p2["head_dist"] = {
        "kernel": params["head_dist"]["kernel"] * 0,
        "bias": params["head_dist"]["bias"] * 0,
    }
    alt = np.asarray(forward(p2, x, HP_DIST))
    assert np.abs(base - alt).max() > 1e-4


def test_file_roundtrip_and_detection(tmp_path):
    """write -> read_model -> detect_hparams infers the extensions the
    legacy hparam block cannot carry (like in_chans/mlp_hidden)."""
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    p = tmp_path / "dist.gguf"
    state = write_synthetic_model(str(p), HP_DIST, ftype=1, seed=5)
    mf = read_model(str(p))
    assert len(mf.tensors) == HP_DIST.expected_tensor_count()
    hp = detect_hparams(mf)
    assert hp.num_prefix_tokens == 2 and hp.norm_pre
    params = load_params(mf, hparams=hp)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    got = np.asarray(forward(params, x, hp))
    # f16 on-disk weights: reference logit budget (BASELINE: 1e-3)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_load_params_infers_without_hparams(tmp_path):
    """Direct load_params callers (no detect_hparams) get the same
    inference from tensor presence."""
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    p = tmp_path / "dist.gguf"
    write_synthetic_model(str(p), HP_DIST, ftype=0, seed=6)
    params = load_params(read_model(str(p)))  # hp from the file block only
    assert "dist_token" in params and "head_dist" in params
    assert "norm_pre" in params
    assert params["pos_embed"].shape == (HP_DIST.n_tokens, HP_DIST.hidden_size)


def test_dist_token_without_head_dist_fails(tmp_path):
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    state = random_state_dict(HP_DIST, seed=7)
    state.pop("head_dist.weight")
    state.pop("head_dist.bias")
    from vit_cpp_tpu.gguf.writer import write_model
    from vit_cpp_tpu.testing.synthetic import state_dict_records

    p = tmp_path / "broken.gguf"
    write_model(str(p), HP_DIST, {}, state_dict_records(state, 0), 0)
    with pytest.raises(ValueError, match="head_dist"):
        load_params(read_model(str(p)))


def test_distilled_rejects_sequence_head():
    from vit_cpp_tpu.gguf.reader import ModelFile, TensorRecord
    from vit_cpp_tpu.gguf.dtypes import GGMLDType
    from vit_cpp_tpu.models.params import load_params

    hp = dataclasses.replace(HP_DIST, seq_len=25)
    state = random_state_dict(HP_DIST, seed=8)
    tensors = {
        n: TensorRecord(n, a.shape, GGMLDType.F32, a) for n, a in state.items()
    }
    mf = ModelFile(hparams=hp, id2label={}, tensors=tensors)
    with pytest.raises(ValueError, match="sequence head"):
        load_params(mf, hparams=hp)


def test_fold_ln_parity_distilled():
    """fold-ln must fold the final norm into BOTH heads."""
    from vit_cpp_tpu.models.fold import fold_layernorms

    state = random_state_dict(HP_DIST, seed=9)
    params = params_from_state_dict(state, HP_DIST)
    folded = fold_layernorms(params, mm_impl="xla")
    assert folded["norm"]["scale"] is None
    x = _images(HP_DIST)
    base = np.asarray(forward(params, x, HP_DIST))
    got = np.asarray(forward(folded, x, HP_DIST))
    np.testing.assert_allclose(got, base, atol=1e-4, rtol=1e-4)


def test_w8a8_distilled_dynamic_and_static():
    """Both heads convert to int8 and share the calibrated pooled-input
    scale; static-vs-dynamic top-1 agreement holds on the calib batch."""
    from vit_cpp_tpu.quant.calibrate import calibrate_act_scales
    from vit_cpp_tpu.quant.int8 import Int8Linear, convert_params_to_int8

    state = random_state_dict(HP_DIST, seed=10)
    params = params_from_state_dict(state, HP_DIST)
    p8 = convert_params_to_int8(params)
    assert isinstance(p8["head_dist"]["kernel"], Int8Linear)
    x = _images(HP_DIST, n=4)
    ref = np.asarray(forward(params, x, HP_DIST))
    dyn = np.asarray(forward(p8, x, HP_DIST, mm_impl="int8"))
    assert (dyn.argmax(-1) == ref.argmax(-1)).mean() >= 0.75
    p8s = calibrate_act_scales(p8, x, HP_DIST)
    assert p8s["head_dist"]["kernel"].act_scale is not None
    stat = np.asarray(forward(p8s, x, HP_DIST, mm_impl="int8"))
    assert (stat.argmax(-1) == dyn.argmax(-1)).mean() >= 0.75


def test_export_roundtrip(tmp_path):
    """fine-tune -> serve loop: save_params writes the extension tensors
    and the reloaded model reproduces the logits."""
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.models.params import load_params

    state = random_state_dict(HP_DIST, seed=11)
    params = params_from_state_dict(state, HP_DIST)
    out = tmp_path / "export.gguf"
    save_params(str(out), params, HP_DIST, ftype=0)
    mf = read_model(str(out))
    assert len(mf.tensors) == HP_DIST.expected_tensor_count()
    hp2 = detect_hparams(mf)
    params2 = load_params(mf, hparams=hp2)
    x = _images(HP_DIST)
    np.testing.assert_allclose(
        np.asarray(forward(params2, x, hp2)),
        np.asarray(forward(params, x, HP_DIST)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_engine_end_to_end(tmp_path):
    """VitEngine serves a distilled checkpoint from file to top-k."""
    from PIL import Image

    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "dist.gguf"
    write_synthetic_model(str(p), HP_DIST, ftype=1, seed=12)
    img = tmp_path / "x.png"
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(img)
    eng = VitEngine(str(p), verbose=False)
    assert eng.hp.num_prefix_tokens == 2 and eng.hp.norm_pre
    top = eng.classify_file(str(img), topk=3, verbose=False)
    assert len(top) == 3
    probs = [t[1] for t in top]
    assert all(0.0 <= q <= 1.0 for q in probs)
    feat = eng.embed_file(str(img))
    assert feat.shape == (HP_DIST.hidden_size,)


def test_sharded_matches_single(tmp_path):
    """dp x tp mesh serving of a distilled+pre-norm model matches the
    single-device engine (head_dist column-parallel like head)."""
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh

    hp = dataclasses.replace(HP_DIST, num_classes=16)
    p = tmp_path / "dist.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=13)
    x = jnp.asarray(_images(hp, n=8, seed=1))
    ref = np.asarray(VitEngine(str(p), verbose=False).predict_probs_batch(x))
    mesh = make_mesh(dp=4, tp=2)
    eng = VitEngine(str(p), verbose=False).shard(mesh)
    with mesh:
        got = np.asarray(eng.predict_probs_batch(x))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_convert_cli_distilled(tmp_path):
    """Offline .pth conversion of a distilled + pre-norm checkpoint."""
    import torch

    from vit_cpp_tpu.cli.convert import convert
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    state = random_state_dict(HP_DIST, seed=14)
    ckpt = tmp_path / "deit.pth"
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, ckpt)
    out = convert(
        checkpoint=str(ckpt),
        output_dir=str(tmp_path),
        ftype=1,
        heads=HP_DIST.num_attention_heads,
        verbose=False,
    )
    mf = read_model(out)
    assert "dist_token" in mf.tensors and "norm_pre.weight" in mf.tensors
    # dist_token keeps f32 like cls_token; head_dist follows the f16 rule
    from vit_cpp_tpu.gguf.dtypes import GGMLDType

    assert mf.tensors["dist_token"].dtype == GGMLDType.F32
    assert mf.tensors["head_dist.weight"].dtype == GGMLDType.F16
    hp = detect_hparams(mf)
    assert hp.num_prefix_tokens == 2 and hp.norm_pre
    assert hp.img_size == HP_DIST.img_size  # prefix-aware grid inference
    params = load_params(mf, hparams=hp)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    np.testing.assert_allclose(
        np.asarray(forward(params, x, hp)), want, atol=2e-3, rtol=2e-3
    )


def test_convert_drop_norm_pre_flag(tmp_path):
    """--drop-norm-pre reproduces the reference converter's skip."""
    import torch

    from vit_cpp_tpu.cli.convert import convert
    from vit_cpp_tpu.gguf.reader import read_model

    state = random_state_dict(HP_PRE, seed=15)
    ckpt = tmp_path / "pre.pth"
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, ckpt)
    out = convert(
        checkpoint=str(ckpt),
        output_dir=str(tmp_path),
        ftype=1,
        heads=HP_PRE.num_attention_heads,
        drop_norm_pre=True,
        verbose=False,
    )
    mf = read_model(out)
    assert "norm_pre.weight" not in mf.tensors
    assert "norm_pre.bias" not in mf.tensors


def test_quantize_covers_head_dist(tmp_path):
    """The quantizer's 2-D `.*weight` rule reaches head_dist, and the
    quantized distilled file loads and serves."""
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.quant.qlinear import QuantLinear

    p = tmp_path / "f16.gguf"
    state = write_synthetic_model(str(p), HP_DIST, ftype=1, seed=16)
    q = tmp_path / "q8.gguf"
    quantize_model_file(str(p), str(q), 8, verbose=False)
    mf = read_model(str(q))
    assert mf.tensors["head_dist.weight"].dtype.is_quantized
    hp = detect_hparams(mf)
    params = load_params(mf, hparams=hp)
    assert isinstance(params["head_dist"]["kernel"], QuantLinear)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    got = np.asarray(forward(params, x, hp))
    # Q8_0 weights: looser budget than f16
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_aot_vitx_distilled(tmp_path):
    """The .vitx AOT path is param-pytree generic; pin that it carries the
    distilled structure: export -> reload -> parity with the live engine."""
    import jax.numpy as jnp

    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "dist.gguf"
    write_synthetic_model(str(p), HP_DIST, ftype=1, seed=18)
    engine = VitEngine(str(p), mm_impl="int8", fold_ln=True, verbose=False)
    out = str(tmp_path / "dist.vitx")
    save_engine(engine, out, batch=2)
    aot = AotEngine(out)
    assert aot.hp.num_prefix_tokens == 2 and aot.hp.norm_pre
    x = jnp.asarray(_images(HP_DIST))
    np.testing.assert_allclose(
        np.asarray(aot.predict_probs_batch(x)),
        np.asarray(engine.predict_probs_batch(x)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_finetune_reinit_covers_head_dist():
    from vit_cpp_tpu.finetune import _reinit_head, _trainable_labels

    state = random_state_dict(HP_DIST, seed=17)
    params = params_from_state_dict(state, HP_DIST)
    p2, hp2 = _reinit_head(params, HP_DIST, 7)
    assert hp2.num_classes == 7
    assert p2["head"]["kernel"].shape == (HP_DIST.hidden_size, 7)
    assert p2["head_dist"]["kernel"].shape == (HP_DIST.hidden_size, 7)
    labels = _trainable_labels(p2, freeze_backbone=True)
    assert labels["head_dist"]["kernel"] == "train"
    assert labels["blocks"]["qkv"]["kernel"] == "freeze"
