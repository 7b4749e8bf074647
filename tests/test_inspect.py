"""vit-inspect CLI: checkpoint/artifact inspection tool."""

import dataclasses
import json

import numpy as np

from vit_cpp_tpu.cli.inspect import main
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model

HP = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=10,
    patch_size=8,
    img_size=32,
)


def test_inspect_table_and_family(tmp_path, capsys):
    hp = dataclasses.replace(HP, num_prefix_tokens=2, norm_pre=True)
    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=1)
    assert main([str(p)]) == 0
    out = capsys.readouterr().out
    assert "hidden_size            = 64" in out
    assert "deit-distilled" in out and "pre-norm" in out
    assert "dist_token" in out and "head_dist.weight" in out


def test_inspect_moe_trait(tmp_path, capsys):
    """A V-MoE checkpoint reports its expert layout as a family trait
    (layout inferred from blocks.*.moe tensors + the meta.moe marker)."""
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.ops.moe import upcycle_params
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    hp = dataclasses.replace(HP, num_hidden_layers=4)
    params = params_from_state_dict(random_state_dict(hp, seed=3), hp)
    up = upcycle_params(params, hp, 4, (1, 3))
    hp_moe = dataclasses.replace(
        hp, num_experts=4, moe_layers=(1, 3), moe_top_k=2, moe_capacity=1.25
    )
    p = tmp_path / "moe.gguf"
    save_params(str(p), up, hp_moe, ftype=1)
    assert main([str(p)]) == 0
    out = capsys.readouterr().out
    assert "v-moe (4 experts top-2 x2 layers, capacity 1.25)" in out


def test_inspect_json_with_tensors(tmp_path, capsys):
    p = tmp_path / "m.gguf"
    state = write_synthetic_model(str(p), HP, ftype=0, seed=2)
    assert main([str(p), "--json", "--tensors"]) == 0
    d = json.loads(capsys.readouterr().out)
    assert d["hparams"]["img_size"] == 32 and d["family"] == []
    assert d["n_tensors"] == len(state) == HP.expected_tensor_count()
    names = {t["name"] for t in d["tensors"]}
    assert "cls_token" in names and "head.weight" in names
    total = sum(t["bytes"] for t in d["tensors"])
    assert total == d["total_bytes"] > 0
    assert d["bytes_by_dtype"]["F32"]["tensors"] == d["n_tensors"]


def test_inspect_vitx_and_errors(tmp_path, capsys):
    from vit_cpp_tpu.aot import save_engine
    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), HP, ftype=1, seed=3)
    vitx = tmp_path / "m.vitx"
    save_engine(VitEngine(str(p), verbose=False), str(vitx), batch=[2])
    assert main([str(vitx)]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["batches"] == [2]
    assert main([str(tmp_path / "missing.gguf")]) == 1
    assert "vit-inspect" in capsys.readouterr().err
    bad = tmp_path / "bad.gguf"
    bad.write_bytes(b"\x00" * 64)
    assert main([str(bad)]) == 1
