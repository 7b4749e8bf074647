"""Cross-framework parity: JAX forward vs an independent plain-torch ViT.

The reference validates against timm outputs (BASELINE: top-5 logits within
1e-3 at f16); with no network egress, the offline analogue is the
plain-torch ViT from scripts/benchmark.py — an independent eager
implementation of the same architecture (timm layout: fused QKV, tanh
GELU, CLS pooling) loaded with the same weights.
"""

import importlib.util
import sys

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.synthetic import random_state_dict


def _load_bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench_script", "scripts/benchmark.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_script"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def setup():
    hp = VitHParams(
        hidden_size=192,
        num_hidden_layers=2,
        num_attention_heads=3,
        num_classes=16,
        patch_size=16,
        img_size=64,
    )
    state = random_state_dict(hp, seed=8)
    return hp, state


def test_logits_match_torch(setup):
    import torch

    hp, state = setup
    bench = _load_bench_module()
    tmodel = bench.build_torch_vit(state, hp)
    params = params_from_state_dict(state, hp)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, hp.img_size, hp.img_size)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(forward(params, x, hp))
    # f32 both sides; reference budget is 1e-3 on top-5 logits at f16
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_logits_match_torch_pallas_kernels(setup):
    import torch

    hp, state = setup
    bench = _load_bench_module()
    tmodel = bench.build_torch_vit(state, hp)
    params = params_from_state_dict(state, hp)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, hp.img_size, hp.img_size)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(forward(params, x, hp, attn_impl="pallas"))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
