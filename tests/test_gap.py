"""Global-average-pool ViT family support (fc_norm / CLS-less /
no_embed_class).

The MAE/DeiT3-style timm branch the reference cannot load (its loader
requires cls_token + norm.*, vit.cpp:518-580): `global_pool='avg'` models
mean-pool the patch tokens and normalize with `fc_norm` (norm is
Identity); some drop the CLS token entirely (class_token=False); DeiT3
adds pos_embed to the patch grid only (`no_embed_class`). All three are
declared by tensor presence/shape and inferred identically at convert,
detect and load time. Parity authority: the f64 numpy oracle.
"""

import dataclasses

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.ref_numpy import forward_numpy
from vit_cpp_tpu.testing.synthetic import random_state_dict, write_synthetic_model

# CLS-less avg-pool (e.g. SigLIP-style encoders with a classifier head)
HP_NOCLS = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=10,
    patch_size=8,
    img_size=32,
    num_prefix_tokens=0,
    global_pool="avg",
)
# MAE-style: CLS kept but ignored, avg pool + fc_norm
HP_MAE = dataclasses.replace(HP_NOCLS, num_prefix_tokens=1)
# DeiT3-style: avg pool + pos_embed over the patch grid only
HP_DEIT3 = dataclasses.replace(HP_MAE, no_embed_class=True)

ALL = [HP_NOCLS, HP_MAE, HP_DEIT3]
IDS = ["no_cls", "mae", "deit3_no_embed_class"]


def _images(hp, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, hp.img_size, hp.img_size)).astype(
        np.float32
    )


def test_shapes_and_counts():
    from vit_cpp_tpu.testing.synthetic import state_dict_shapes

    s = state_dict_shapes(HP_NOCLS)
    assert "cls_token" not in s and "norm.weight" not in s
    assert s["fc_norm.weight"] == (64,)
    assert s["pos_embed"] == (1, HP_NOCLS.n_patches, 64)
    assert HP_NOCLS.expected_tensor_count() == 8 + 24 - 1
    s2 = state_dict_shapes(HP_DEIT3)
    assert s2["pos_embed"] == (1, HP_DEIT3.n_patches, 64)  # grid only
    s3 = state_dict_shapes(HP_MAE)
    assert s3["pos_embed"] == (1, HP_MAE.n_patches + 1, 64)


@pytest.mark.parametrize("hp", ALL, ids=IDS)
def test_forward_matches_numpy_oracle(hp):
    state = random_state_dict(hp, seed=21)
    params = params_from_state_dict(state, hp)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    got = np.asarray(forward(params, x, hp))
    assert got.shape == (2, hp.num_classes)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pos_embed_applied_in_no_embed_class_layout():
    """A (non-LN-invariant) pos_embed perturbation must change the logits
    — guards against silently dropping the grid-only positional add."""
    state = random_state_dict(HP_DEIT3, seed=22)
    params = params_from_state_dict(state, HP_DEIT3)
    x = _images(HP_DEIT3)
    base = np.asarray(forward(params, x, HP_DEIT3))
    s2 = dict(state)
    rng = np.random.default_rng(1)
    s2["pos_embed"] = (
        state["pos_embed"]
        + 0.3 * rng.standard_normal(state["pos_embed"].shape).astype(np.float32)
    )
    got = np.asarray(
        forward(params_from_state_dict(s2, HP_DEIT3), x, HP_DEIT3)
    )
    assert np.abs(got - base).max() > 1e-3


@pytest.mark.parametrize("hp", ALL, ids=IDS)
def test_file_roundtrip_and_detection(tmp_path, hp):
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    p = tmp_path / "gap.gguf"
    state = write_synthetic_model(str(p), hp, ftype=1, seed=23)
    mf = read_model(str(p))
    assert len(mf.tensors) == hp.expected_tensor_count()
    got_hp = detect_hparams(mf)
    assert got_hp.global_pool == "avg"
    assert got_hp.num_prefix_tokens == hp.num_prefix_tokens
    assert got_hp.no_embed_class == hp.no_embed_class
    params = load_params(mf, hparams=got_hp)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    got = np.asarray(forward(params, x, got_hp))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_load_params_infers_without_hparams(tmp_path):
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    for hp, check in [
        (HP_NOCLS, lambda p: "cls_token" not in p),
        (HP_DEIT3, lambda p: p["pos_embed"].shape[0] == hp.n_patches),
    ]:
        p = tmp_path / f"g{hp.num_prefix_tokens}.gguf"
        write_synthetic_model(str(p), hp, ftype=0, seed=24)
        params = load_params(read_model(str(p)))
        assert check(params)


def test_conflicting_norms_rejected(tmp_path):
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.gguf.writer import write_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.testing.synthetic import state_dict_records

    state = random_state_dict(HP_MAE, seed=25)
    state["norm.weight"] = state["fc_norm.weight"]
    state["norm.bias"] = state["fc_norm.bias"]
    p = tmp_path / "both.gguf"
    write_model(str(p), HP_MAE, {}, state_dict_records(state, 0), 0)
    with pytest.raises(ValueError, match="both norm.weight and fc_norm"):
        load_params(read_model(str(p)))


def test_convert_rejects_both_norms():
    """A checkpoint with both norm.* and fc_norm.* would serialize into a
    file load_params refuses — the converter must reject it upfront
    instead of writing an unloadable gguf (review r3)."""
    from vit_cpp_tpu.cli.convert import infer_hparams

    state = random_state_dict(HP_MAE, seed=40)
    state["norm.weight"] = state["fc_norm.weight"]
    state["norm.bias"] = state["fc_norm.bias"]
    with pytest.raises(ValueError, match="both norm.weight and fc_norm"):
        infer_hparams(state, heads=HP_MAE.num_attention_heads)


def test_no_cls_no_fc_norm_rejected(tmp_path):
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.gguf.writer import write_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.testing.synthetic import state_dict_records

    state = random_state_dict(HP_NOCLS, seed=26)
    state["norm.weight"] = state.pop("fc_norm.weight")
    state["norm.bias"] = state.pop("fc_norm.bias")
    p = tmp_path / "nothing_to_pool.gguf"
    write_model(str(p), HP_NOCLS, {}, state_dict_records(state, 0), 0)
    with pytest.raises(ValueError, match="nothing to pool"):
        load_params(read_model(str(p)))


def test_fold_w8a8_and_static_scales():
    """The production serving stack (fold-ln + W8A8 + calibrated static
    scales) runs the avg-pool head path."""
    from vit_cpp_tpu.models.fold import fold_layernorms
    from vit_cpp_tpu.quant.calibrate import calibrate_act_scales
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8

    state = random_state_dict(HP_MAE, seed=27)
    params = params_from_state_dict(state, HP_MAE)
    x = _images(HP_MAE, n=4)
    ref = np.asarray(forward(params, x, HP_MAE))
    folded = fold_layernorms(params, mm_impl="xla")
    np.testing.assert_allclose(
        np.asarray(forward(folded, x, HP_MAE)), ref, atol=1e-4, rtol=1e-4
    )
    p8 = calibrate_act_scales(
        convert_params_to_int8(params), x, HP_MAE
    )
    stat = np.asarray(forward(p8, x, HP_MAE, mm_impl="int8"))
    assert (stat.argmax(-1) == ref.argmax(-1)).mean() >= 0.75


def test_export_roundtrip(tmp_path):
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.models.params import load_params

    for hp in (HP_NOCLS, HP_DEIT3):
        state = random_state_dict(hp, seed=28)
        params = params_from_state_dict(state, hp)
        out = tmp_path / f"gap{hp.num_prefix_tokens}.gguf"
        save_params(str(out), params, hp, ftype=0)
        mf = read_model(str(out))
        assert "fc_norm.weight" in mf.tensors
        assert ("cls_token" in mf.tensors) == (hp.num_prefix_tokens == 1)
        hp2 = detect_hparams(mf)
        params2 = load_params(mf, hparams=hp2)
        x = _images(hp)
        np.testing.assert_allclose(
            np.asarray(forward(params2, x, hp2)),
            np.asarray(forward(params, x, hp)),
            atol=1e-5,
            rtol=1e-5,
        )


def test_sharded_matches_single(tmp_path):
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh

    hp = dataclasses.replace(HP_MAE, num_classes=16)
    p = tmp_path / "gap.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=29)
    x = jnp.asarray(_images(hp, n=8, seed=1))
    ref = np.asarray(VitEngine(str(p), verbose=False).predict_probs_batch(x))
    mesh = make_mesh(dp=4, tp=2)
    eng = VitEngine(str(p), verbose=False).shard(mesh)
    with mesh:
        got = np.asarray(eng.predict_probs_batch(x))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_convert_cli_gap(tmp_path):
    """Offline .pth conversion of MAE-style (cls + fc_norm) and
    DeiT3-style (no_embed_class) checkpoints."""
    import torch

    from vit_cpp_tpu.cli.convert import convert, infer_hparams
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    for hp in (HP_MAE, HP_DEIT3, HP_NOCLS):
        state = random_state_dict(hp, seed=30)
        inferred = infer_hparams(state, heads=hp.num_attention_heads)
        assert inferred.global_pool == "avg"
        assert inferred.num_prefix_tokens == hp.num_prefix_tokens
        assert inferred.no_embed_class == hp.no_embed_class
        assert inferred.img_size == hp.img_size
        ckpt = tmp_path / "gap.pth"
        torch.save({k: torch.from_numpy(v) for k, v in state.items()}, ckpt)
        out = convert(
            checkpoint=str(ckpt),
            output_dir=str(tmp_path),
            ftype=1,
            heads=hp.num_attention_heads,
            verbose=False,
        )
        mf = read_model(out)
        got_hp = detect_hparams(mf)
        params = load_params(mf, hparams=got_hp)
        x = _images(hp)
        want = forward_numpy(state, hp, x)
        np.testing.assert_allclose(
            np.asarray(forward(params, x, got_hp)), want, atol=2e-3, rtol=2e-3
        )


def test_pad_tokens_excludes_pads_from_mean():
    """Serving-mode token padding must not pollute the avg pool: padded
    and unpadded logits agree."""
    state = random_state_dict(HP_MAE, seed=31)
    params = params_from_state_dict(state, HP_MAE)
    x = _images(HP_MAE)
    # n_tokens = 16 patches + 1 cls = 17 -> pads to 24
    assert HP_MAE.n_tokens % 8
    base = np.asarray(forward(params, x, HP_MAE, attn_impl="pallas"))
    padded = np.asarray(
        forward(params, x, HP_MAE, attn_impl="pallas", pad_tokens=True)
    )
    np.testing.assert_allclose(padded, base, atol=1e-4, rtol=1e-4)
