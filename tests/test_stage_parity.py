"""Full-geometry per-stage parity: every block's activations vs the f64
numpy oracle at real ViT-B/16 @224 shape (12 layers, 197 tokens).

The §4 parity harness the survey demands — the TPU analogue of diffing the
reference's print_t_f32 dumps stage by stage (vit.cpp:54-84, call sites
vit.cpp:1038). Two legs:

- f32 dense: forward_debug(attn=xla, mm=xla) vs forward_numpy_debug; every
  stage within an f32-accumulation budget, final logits within the 1e-3
  reference budget (BASELINE.md correctness row).
- Q8_0: the block-faithful dequant path (mm_impl='pallas' dispatches to
  the dequantizing matmul; on CPU it runs the jnp reference of the same
  math) vs the oracle fed the SAME encode/decode-roundtripped weights —
  isolating kernel error from quantization error.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.vit import forward_debug
from vit_cpp_tpu.testing.ref_numpy import forward_numpy_debug
from vit_cpp_tpu.testing.synthetic import random_state_dict

HP = VitHParams(
    hidden_size=768,
    num_hidden_layers=12,
    num_attention_heads=12,
    num_classes=1000,
    patch_size=16,
    img_size=224,
)


def _images(batch=1):
    rng = np.random.default_rng(11)
    # preprocessed-style range (ImageNet-normalized activations are ~[-2.6, 2.7])
    return rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)


@pytest.mark.slow
def test_per_stage_parity_f32_full_geometry():
    state = random_state_dict(HP, seed=5)
    imgs = _images()
    params = params_from_state_dict(state, HP, dtype=jnp.float32)
    got = forward_debug(params, jnp.asarray(imgs), HP)
    want = forward_numpy_debug(state, HP, imgs)

    assert set(got) == set(want)
    for i in range(HP.num_hidden_layers):
        key = f"block_{i}"
        g = np.asarray(got[key], dtype=np.float64)
        w = want[key]
        scale = max(1.0, float(np.abs(w).max()))
        diff = float(np.abs(g - w).max())
        assert diff / scale < 5e-5, f"{key}: rel diff {diff / scale:.2e}"
    logit_diff = float(
        np.abs(np.asarray(got["logits"], dtype=np.float64) - want["logits"]).max()
    )
    assert logit_diff < 1e-3, f"logits diff {logit_diff:.2e}"


@pytest.mark.slow
def test_per_stage_parity_q8_0_full_geometry():
    from vit_cpp_tpu.gguf.dtypes import GGMLDType
    from vit_cpp_tpu.quant.blocks import dequantize, quantize

    state = random_state_dict(HP, seed=6)
    # oracle sees the encode/decode-roundtripped weights (2-D .*weight rule)
    state_q = dict(state)
    qls = {}
    for name, arr in state.items():
        if name.endswith("weight") and arr.ndim == 2:
            raw = quantize(arr.astype(np.float32), GGMLDType.Q8_0)
            state_q[name] = dequantize(raw, arr.size, GGMLDType.Q8_0).reshape(
                arr.shape
            )
            qls[name] = raw

    imgs = _images()
    # the engine side loads the ACTUAL quantized file bytes
    import tempfile

    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    with tempfile.TemporaryDirectory() as d:
        write_synthetic_model(f"{d}/m.gguf", HP, ftype=0, seed=6)
        quantize_model_file(f"{d}/m.gguf", f"{d}/q.gguf", 8, verbose=False)
        params = load_params(read_model(f"{d}/q.gguf"), dtype=jnp.float32)

    got = forward_debug(params, jnp.asarray(imgs), HP, mm_impl="pallas")
    want = forward_numpy_debug(state_q, HP, imgs)
    for i in range(HP.num_hidden_layers):
        key = f"block_{i}"
        g = np.asarray(got[key], dtype=np.float64)
        w = want[key]
        scale = max(1.0, float(np.abs(w).max()))
        diff = float(np.abs(g - w).max())
        assert diff / scale < 5e-5, f"{key}: rel diff {diff / scale:.2e}"
    logit_diff = float(
        np.abs(np.asarray(got["logits"], dtype=np.float64) - want["logits"]).max()
    )
    assert logit_diff < 1e-3, f"logits diff {logit_diff:.2e}"
