"""Checkpoint converter: torch .pth -> model file -> engine round trip.

Mirrors the reference converter's serialization rules (SURVEY.md C13, C20;
convert-pth-to-ggml.py:117-158): f16 dtype rule, pos_embed/cls_token kept
f32, patch-bias reshape, norm_pre skip, ViTSTR grayscale collapse.
"""

import numpy as np
import pytest
import torch

from vit_cpp_tpu.cli.convert import (
    collapse_to_grayscale,
    convert,
    infer_hparams,
    normalize_state_dict,
)
from vit_cpp_tpu.gguf.dtypes import GGMLDType
from vit_cpp_tpu.gguf.reader import read_model
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import random_state_dict


def _hp():
    return VitHParams(
        hidden_size=192,
        num_hidden_layers=2,
        num_attention_heads=3,
        num_classes=10,
        patch_size=16,
        img_size=64,
    )


@pytest.fixture()
def torch_ckpt(tmp_path):
    hp = _hp()
    state = random_state_dict(hp, seed=3)
    # torch-style: the converter input has the unreshaped conv bias and the
    # (1,1,h)/(1,T,h) token shapes of a real timm state dict.
    tstate = {
        k: torch.from_numpy(v.reshape(-1) if k == "patch_embed.proj.bias" else v)
        for k, v in state.items()
    }
    path = tmp_path / "vit.pth"
    torch.save(tstate, path)
    return str(path), hp, state


class TestInference:
    def test_infer_hparams(self, torch_ckpt):
        path, hp, state = torch_ckpt
        got = infer_hparams({k: np.asarray(v) for k, v in state.items()})
        assert got.hidden_size == hp.hidden_size
        assert got.num_hidden_layers == hp.num_hidden_layers
        assert got.num_attention_heads == 3  # from the 192->3 family table
        assert got.patch_size == hp.patch_size
        assert got.img_size == hp.img_size
        assert got.num_classes == hp.num_classes

    def test_infer_hparams_non_4x_mlp(self, torch_ckpt):
        """ViT-g-family widths (MLP != 4x) are read off the fc1 shape."""
        path, hp, state = torch_ckpt
        st = {k: np.asarray(v) for k, v in state.items()}
        assert infer_hparams(st).mlp_hidden is None  # 4x family: no override
        wide = hp.hidden_size * 11 // 4
        for i in range(hp.num_hidden_layers):
            st[f"blocks.{i}.mlp.fc1.weight"] = np.zeros(
                (wide, hp.hidden_size), np.float32
            )
            st[f"blocks.{i}.mlp.fc1.bias"] = np.zeros((wide,), np.float32)
            st[f"blocks.{i}.mlp.fc2.weight"] = np.zeros(
                (hp.hidden_size, wide), np.float32
            )
        got = infer_hparams(st)
        assert got.mlp_hidden == wide
        assert got.mlp_dim == wide

    def test_normalize_strips_prefixes(self):
        raw = {"module.vitstr.norm.weight": torch.ones(4)}
        out = normalize_state_dict(raw)
        assert list(out) == ["norm.weight"]

    def test_normalize_unwraps_nested(self):
        raw = {"state_dict": {"norm.weight": torch.ones(4)}}
        assert list(normalize_state_dict(raw)) == ["norm.weight"]

    def test_grayscale_collapse(self):
        pe = np.arange(2 * 3 * 4 * 4, dtype=np.float32).reshape(2, 3, 4, 4)
        out = collapse_to_grayscale({"patch_embed.proj.weight": pe})
        assert out["patch_embed.proj.weight"].shape == (2, 1, 4, 4)
        np.testing.assert_allclose(
            out["patch_embed.proj.weight"][:, 0], pe.sum(1)
        )


class TestConvertRoundTrip:
    def test_f16_rules_and_forward_parity(self, torch_ckpt, tmp_path):
        path, hp, state = torch_ckpt
        out = convert(
            checkpoint=path, output_dir=str(tmp_path), ftype=1, verbose=False
        )
        mf = read_model(out)
        assert mf.hparams.hidden_size == hp.hidden_size
        # dtype rule: ndim!=1 -> f16 except pos_embed/cls_token (py:141-148)
        assert mf.tensors["pos_embed"].dtype == GGMLDType.F32
        assert mf.tensors["cls_token"].dtype == GGMLDType.F32
        assert mf.tensors["patch_embed.proj.weight"].dtype == GGMLDType.F16
        assert mf.tensors["blocks.0.attn.qkv.weight"].dtype == GGMLDType.F16
        assert mf.tensors["norm.weight"].dtype == GGMLDType.F32
        # conv bias reshaped to (1, C, 1, 1) (py:150-151)
        assert mf.tensors["patch_embed.proj.bias"].shape == (
            1,
            hp.hidden_size,
            1,
            1,
        )
        assert len(mf.tensors) == mf.hparams.expected_tensor_count()

        from vit_cpp_tpu.models import load_params
        from vit_cpp_tpu.models.vit import forward
        from vit_cpp_tpu.testing.ref_numpy import forward_numpy

        params = load_params(mf)
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((2, 3, hp.img_size, hp.img_size)).astype(
            np.float32
        )
        got = np.asarray(forward(params, imgs, mf.hparams))
        want = forward_numpy(state, hp, imgs)
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    def test_norm_pre_written_by_default(self, torch_ckpt, tmp_path):
        """Deliberate fix of the reference quirk (SURVEY.md §2.5): norm_pre
        tensors are written and served; --drop-norm-pre restores the
        reference converter's skip (tests/test_distilled.py covers the
        full pre-norm forward parity)."""
        path, hp, state = torch_ckpt
        tstate = {k: torch.from_numpy(v) for k, v in state.items()}
        tstate["norm_pre.weight"] = torch.ones(hp.hidden_size)
        tstate["norm_pre.bias"] = torch.zeros(hp.hidden_size)
        p2 = tmp_path / "with_pre.pth"
        torch.save(tstate, p2)
        out = convert(
            checkpoint=str(p2), output_dir=str(tmp_path), ftype=0, verbose=False
        )
        assert "norm_pre.weight" in read_model(out).tensors
        out2 = convert(
            checkpoint=str(p2),
            output_dir=str(tmp_path),
            ftype=0,
            drop_norm_pre=True,
            verbose=False,
        )
        assert "norm_pre.weight" not in read_model(out2).tensors

    def test_vitstr_conversion(self, tmp_path):
        hp = VitHParams(
            hidden_size=192,
            num_hidden_layers=2,
            num_attention_heads=3,
            num_classes=96,
            patch_size=16,
            img_size=64,
        )
        state = random_state_dict(hp, seed=5)
        tstate = {
            k: torch.from_numpy(
                v.reshape(-1) if k == "patch_embed.proj.bias" else v
            )
            for k, v in state.items()
        }
        path = tmp_path / "vitstr.pth"
        torch.save(tstate, path)
        out = convert(
            checkpoint=str(path),
            output_dir=str(tmp_path),
            ftype=1,
            vitstr=True,
            verbose=False,
        )
        mf = read_model(out)
        assert mf.tensors["patch_embed.proj.weight"].shape[1] == 1
        assert mf.id2label[0] == "[GO]"
        assert mf.id2label[1] == "[s]"
        assert len(mf.id2label) == 96

        from vit_cpp_tpu.engine import detect_hparams

        hp2 = detect_hparams(mf)
        assert hp2.in_chans == 1
        assert hp2.seq_len == 25


def test_convert_real_gguf_container(torch_ckpt, tmp_path):
    path, hp, state = torch_ckpt
    out = convert(
        checkpoint=path,
        output_dir=str(tmp_path),
        ftype=1,
        real_gguf=True,
        verbose=False,
    )
    with open(out, "rb") as f:
        assert f.read(4) == b"GGUF"
    mf = read_model(out)  # transparent dispatch
    assert mf.hparams.hidden_size == hp.hidden_size
    assert len(mf.tensors) == mf.hparams.expected_tensor_count()


def test_timm_path_fails_gracefully_without_timm():
    """Converting by model name without the timm wheel must exit with a
    clear pointer to the offline --checkpoint path (this environment has
    no timm and no network egress)."""
    try:
        import timm  # noqa: F401

        pytest.skip("timm installed; gated path not exercisable")
    except ImportError:
        pass
    with pytest.raises(SystemExit, match="--checkpoint"):
        convert(model_name="vit_tiny_patch16_224", verbose=False)


class TestTimmLabelParity:
    """Pin the exact timm labeling call shape the reference uses
    (convert-pth-to-ggml.py:85-93): non-detailed index_to_description over
    dataset_info.num_classes() entries; infer_imagenet_subset receives the
    MODEL object. Mocked timm — no wheel/network in this harness."""

    def _install_fake_timm(self, monkeypatch, subset):
        import sys
        import types

        calls = {"detailed": [], "count_source": None, "subset_arg": None}

        class FakeInfo:
            def __init__(self, s):
                assert s == subset

            def num_classes(self):
                calls["count_source"] = "dataset_info"
                return 3

            def index_to_description(self, i, detailed=False):
                calls["detailed"].append(detailed)
                return f"desc_{i}"

        def fake_infer(model):
            calls["subset_arg"] = model
            return subset

        data = types.ModuleType("timm.data")
        data.ImageNetInfo = FakeInfo
        data.infer_imagenet_subset = fake_infer
        timm_mod = types.ModuleType("timm")
        timm_mod.data = data
        monkeypatch.setitem(sys.modules, "timm", timm_mod)
        monkeypatch.setitem(sys.modules, "timm.data", data)
        return calls

    def test_label_call_shape(self, monkeypatch):
        from vit_cpp_tpu.cli.convert import _timm_id2label

        calls = self._install_fake_timm(monkeypatch, "imagenet-1k")
        model = object()
        labels = _timm_id2label(model, num_classes=1000)
        # count comes from dataset_info.num_classes(), not the model
        assert labels == {0: "desc_0", 1: "desc_1", 2: "desc_2"}
        assert calls["count_source"] == "dataset_info"
        assert calls["subset_arg"] is model
        # reference calls index_to_description WITHOUT detailed=True
        assert all(d is False for d in calls["detailed"])

    def test_fallback_without_subset(self, monkeypatch):
        import sys
        import types

        from vit_cpp_tpu.cli.convert import _timm_id2label

        data = types.ModuleType("timm.data")
        data.ImageNetInfo = lambda s: None
        data.infer_imagenet_subset = lambda model: None
        timm_mod = types.ModuleType("timm")
        timm_mod.data = data
        monkeypatch.setitem(sys.modules, "timm", timm_mod)
        monkeypatch.setitem(sys.modules, "timm.data", data)
        labels = _timm_id2label(object(), num_classes=4)
        assert labels == {i: f"LABEL_{i}" for i in range(4)}


def test_list_flag(monkeypatch, capsys):
    """--list prints family examples via timm.list_pretrained and exits 1
    (reference convert-pth-to-ggml.py:52-77)."""
    import sys
    import types

    from vit_cpp_tpu.cli.convert import main

    timm_mod = types.ModuleType("timm")
    timm_mod.list_pretrained = lambda pat: [pat.replace("*", "_demo")]
    monkeypatch.setitem(sys.modules, "timm", timm_mod)
    rc = main(["--list"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "Here are some model names (not all are supported!) : " in out
    for size in ["TINY", "SMALL", "BASE", "LARGE"]:
        assert f"---- {size} ----" in out
    assert "vit_tiny_demo" in out
