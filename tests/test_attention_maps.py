"""Attention-map extraction + rollout (models/attention_maps.py,
vit-explain CLI). The maps path re-runs the encoder capturing softmax
weights; its correctness anchor is logit-equivalence with the production
forward, and the rollout against a direct numpy re-expression."""

import dataclasses

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.attention_maps import (
    attention_maps,
    attention_rollout,
)
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.synthetic import random_state_dict, write_synthetic_model

HP = VitHParams(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_classes=10,
    patch_size=8,
    img_size=32,
)


def _images(hp, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, hp.img_size, hp.img_size)).astype(
        np.float32
    )


def test_maps_shapes_and_rows_sum_to_one():
    state = random_state_dict(HP, seed=1)
    params = params_from_state_dict(state, HP)
    x = _images(HP)
    probs, _ = attention_maps(params, x, HP)
    t = HP.n_tokens
    assert probs.shape == (2, 3, 4, t, t)
    sums = np.asarray(probs).sum(axis=-1)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-5)


def test_maps_path_matches_production_forward():
    """The final block output of the maps path, pushed through the same
    pooling/norm/head, must reproduce the production logits — pins the
    re-expressed block math to models/vit.py."""
    import jax.numpy as jnp

    from vit_cpp_tpu.ops.core import layernorm, linear

    state = random_state_dict(HP, seed=2)
    params = params_from_state_dict(state, HP)
    x = _images(HP)
    want = np.asarray(forward(params, x, HP, attn_impl="xla"))
    _, final = attention_maps(params, x, HP)
    pooled = layernorm(
        final[:, 0], params["norm"]["scale"], params["norm"]["bias"], HP.eps
    )
    got = np.asarray(
        linear(pooled, params["head"]["kernel"], params["head"]["bias"])
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_head_logits_matches_forward_on_bf16():
    """The maps path keeps f32 attention logits like ops/core.attention
    (review r3: a bf16 score einsum would round before the softmax) —
    head_logits over the maps final output tracks the bf16 production
    forward within bf16 tolerance, for the plain and distilled heads."""
    import jax.numpy as jnp

    from vit_cpp_tpu.models.attention_maps import head_logits

    for hp in (HP, dataclasses.replace(HP, num_prefix_tokens=2)):
        state = random_state_dict(hp, seed=7)
        params = params_from_state_dict(state, hp, dtype=jnp.bfloat16)
        x = jnp.asarray(_images(hp), dtype=jnp.bfloat16)
        want = np.asarray(
            forward(params, x, hp, attn_impl="xla"), dtype=np.float32
        )
        _, final = attention_maps(params, x, hp)
        got = np.asarray(head_logits(params, final, hp), dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_explain_file_single_pass_matches_classify(tmp_path):
    """explain_file's top-k (one encoder pass) matches classify_file's."""
    from PIL import Image

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model as _w

    p = tmp_path / "m.gguf"
    _w(str(p), HP, ftype=1, seed=8)
    rng = np.random.default_rng(9)
    img = tmp_path / "x.png"
    Image.fromarray(
        rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(img)
    eng = VitEngine(str(p), verbose=False)
    top, grid = eng.explain_file(str(img), topk=3)
    ref = eng.classify_file(str(img), topk=3, verbose=False)
    assert [t[0] for t in top] == [r[0] for r in ref]
    np.testing.assert_allclose(
        [t[1] for t in top], [r[1] for r in ref], atol=1e-5
    )
    assert grid.shape == (4, 4)


def test_rollout_matches_numpy_oracle():
    """Direct re-expression of Abnar & Zuidema rollout on random maps."""
    rng = np.random.default_rng(3)
    t = HP.n_tokens
    raw = rng.random((2, 3, 4, t, t)).astype(np.float32)
    probs = raw / raw.sum(axis=-1, keepdims=True)
    got = attention_rollout(probs, HP)
    a = probs.mean(axis=2)
    a = 0.5 * a + 0.5 * np.eye(t, dtype=np.float32)
    a = a / a.sum(-1, keepdims=True)
    for b in range(2):
        r = np.eye(t, dtype=np.float32)
        for layer in range(3):
            r = a[b, layer] @ r
        grid = r[0, 1:].reshape(4, 4)  # CLS readout row, patch columns
        grid = grid / grid.max()
        np.testing.assert_allclose(got[b], grid, atol=1e-6)
    assert got.shape == (2, 4, 4) and got.max() <= 1.0 + 1e-6
    with pytest.raises(ValueError, match="head_fuse"):
        attention_rollout(probs, HP, head_fuse="sum")


def test_rollout_readout_rows_per_family():
    """Distilled models average the CLS+dist readout rows; CLS-less
    avg-pool models average the patch-query rows."""
    t_dist = HP.n_patches + 2
    rng = np.random.default_rng(4)
    raw = rng.random((1, 2, 4, t_dist, t_dist)).astype(np.float32)
    probs = raw / raw.sum(-1, keepdims=True)
    hp_dist = dataclasses.replace(HP, num_prefix_tokens=2)
    g = attention_rollout(probs, hp_dist)
    assert g.shape == (1, 4, 4)
    hp_gap = dataclasses.replace(
        HP, num_prefix_tokens=0, global_pool="avg"
    )
    t_gap = HP.n_patches
    raw = rng.random((1, 2, 4, t_gap, t_gap)).astype(np.float32)
    probs = raw / raw.sum(-1, keepdims=True)
    g = attention_rollout(probs, hp_gap)
    assert g.shape == (1, 4, 4) and np.isfinite(g).all()


def test_maps_run_on_quantized_and_folded_engines(tmp_path):
    """The debug path dispatches through the same linear() leaves, so it
    works on W8A8 + fold-ln engines too."""
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), HP, ftype=1, seed=5)
    ref = VitEngine(str(p), verbose=False)
    x = jnp.asarray(_images(HP))
    maps_ref = ref.attention_maps_batch(x)
    w8 = VitEngine(str(p), mm_impl="int8", fold_ln=True, verbose=False)
    maps_w8 = w8.attention_maps_batch(x)
    assert maps_ref.shape == maps_w8.shape == (2, 3, 4, 17, 17)
    # quantization shifts probabilities but not the broad structure
    assert np.abs(maps_ref - maps_w8).max() < 0.2


def test_explain_cli(tmp_path, capsys):
    from PIL import Image

    from vit_cpp_tpu.cli.explain import main

    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), HP, ftype=1, seed=6)
    rng = np.random.default_rng(7)
    img = tmp_path / "x.png"
    Image.fromarray(
        rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
    ).save(img)
    out_png = tmp_path / "heat.png"
    out_npy = tmp_path / "heat.npy"
    rc = main(
        ["-m", str(p), "-i", str(img), "-o", str(out_png), "--npy", str(out_npy)]
    )
    assert rc == 0
    cap = capsys.readouterr()
    assert " > LABEL_" in cap.out
    grid = np.load(out_npy)
    assert grid.shape == (4, 4) and 0.0 <= grid.min() and grid.max() <= 1.0
    heat = np.asarray(Image.open(out_png))
    assert heat.shape == (32, 32)  # upscaled to img_size
    # no output target -> usage error
    assert main(["-m", str(p), "-i", str(img)]) == 1
