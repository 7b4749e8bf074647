"""LoRA fine-tuning (models/lora.py + train_step_lora): zero-effect
init, merge math, gradients confined to the adapters, descent on mesh,
fold-at-export serving, QAT composition, and the resume-meta guard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models.lora import (
    LORA_SITES,
    init_lora,
    lora_state_bytes,
    lora_trainable,
    merge_lora,
)

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=16,
    patch_size=8,
    img_size=32,
)


def _tiny_params(seed=0, hp=TINY):
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    return params_from_state_dict(random_state_dict(hp, seed=seed), hp)


def test_init_is_zero_effect_and_shapes():
    """b = 0 => merged model == base model bit-for-bit at step 0."""
    params = _tiny_params()
    tr = lora_trainable(params, rank=4, seed=1)
    for name in LORA_SITES:
        a = tr["lora"]["blocks"][name]["a"]
        b = tr["lora"]["blocks"][name]["b"]
        k = params["blocks"][name]["kernel"]
        assert a.shape == (k.shape[0], k.shape[1], 4)
        assert b.shape == (k.shape[0], 4, k.shape[2])
        np.testing.assert_array_equal(np.asarray(b), 0.0)
    merged = merge_lora(params, tr, alpha=8.0)
    for name in LORA_SITES:
        np.testing.assert_array_equal(
            np.asarray(merged["blocks"][name]["kernel"]),
            np.asarray(params["blocks"][name]["kernel"]),
        )
    with pytest.raises(ValueError, match="rank"):
        init_lora(params, 0)
    # 8% at this tiny hidden-64 geometry (rank/hidden = 1/16); the ratio
    # scales as ~2r/hidden, <1% at ViT-B rank 4
    assert lora_state_bytes(tr) < 0.15 * lora_state_bytes(params)


def test_merge_math_matches_manual_delta():
    params = _tiny_params(seed=2)
    tr = lora_trainable(params, rank=3, seed=3)
    rng = np.random.default_rng(4)
    # give b real values so the delta is nonzero
    for name in LORA_SITES:
        ab = tr["lora"]["blocks"][name]
        ab["b"] = jnp.asarray(
            rng.standard_normal(ab["b"].shape).astype(np.float32) * 0.1
        )
    alpha = 6.0
    merged = merge_lora(params, tr, alpha)
    for name in LORA_SITES:
        a = np.asarray(tr["lora"]["blocks"][name]["a"], np.float64)
        b = np.asarray(tr["lora"]["blocks"][name]["b"], np.float64)
        want = np.asarray(
            params["blocks"][name]["kernel"], np.float64
        ) + (alpha / 3.0) * np.einsum("lir,lro->lio", a, b)
        np.testing.assert_allclose(
            np.asarray(merged["blocks"][name]["kernel"]), want,
            rtol=2e-5, atol=2e-5,
        )


def test_lora_gradients_do_not_touch_base():
    """value_and_grad of the LoRA loss returns grads ONLY over the
    trainable tree; a training step leaves the base bit-identical and
    moves the adapters."""
    from vit_cpp_tpu.parallel.train import lora_cross_entropy_loss

    params = _tiny_params(seed=5)
    tr = lora_trainable(params, rank=2, seed=6)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 16, (4,)), jnp.int32)
    loss, grads = jax.value_and_grad(lora_cross_entropy_loss)(
        tr, params, x, y, TINY, 4.0
    )
    assert np.isfinite(float(loss))
    assert jax.tree.structure(grads) == jax.tree.structure(tr)
    # adapters receive signal: dL/db nonzero (a's grad is zero at b=0)
    gb = grads["lora"]["blocks"]["qkv"]["b"]
    assert float(jnp.abs(gb).max()) > 0
    gh = grads["head"]["kernel"]
    assert float(jnp.abs(gh).max()) > 0


@pytest.mark.parametrize("qat", ["", "q8_0"])
def test_train_step_lora_descends_on_mesh(qat):
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.sharding import shard_params
    from vit_cpp_tpu.parallel.train import (
        create_lora_train_state,
        make_optimizer,
        shard_batch,
        train_step_lora,
    )

    params = _tiny_params(seed=8)
    tr = lora_trainable(params, rank=4, seed=9)
    rng = np.random.default_rng(10)
    images = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, (8,)), jnp.int32)
    mesh = make_mesh(dp=4, tp=2)
    optimizer = make_optimizer(lr=1e-2)
    with mesh:
        base = shard_params(jax.tree.map(jnp.asarray, params), mesh)
        state = create_lora_train_state(tr, mesh, optimizer)
        si, sl = shard_batch(images, labels, mesh)
        state, loss = train_step_lora(
            state, base, si, sl, TINY, optimizer, alpha=8.0, qat=qat
        )
        state, loss2 = train_step_lora(
            state, base, si, sl, TINY, optimizer, alpha=8.0, qat=qat
        )
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss)
    # the frozen base never moved
    np.testing.assert_array_equal(
        np.asarray(base["blocks"]["qkv"]["kernel"]),
        np.asarray(params["blocks"]["qkv"]["kernel"]),
    )


@pytest.mark.slow
def test_finetune_lora_learns_and_serves_folded(tmp_path):
    """--lora end to end: adapters train, the exported gguf carries the
    FOLDED dense kernels, and serving needs no adapter machinery."""
    from tests.test_finetune import _make_dataset
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import evaluate, finetune, load_dataset
    from vit_cpp_tpu.finetune import _preprocess_all
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=7,
        patch_size=8,
        img_size=32,
    )
    base = str(tmp_path / "m.gguf")
    write_synthetic_model(base, hp, ftype=1, seed=4)
    data = _make_dataset(tmp_path / "train")
    params, hp2, classes, losses = finetune(
        base, data, epochs=6, batch=4, lr=1e-2, lora=4,
        log=lambda m: None,
    )
    assert losses[-1] < losses[0]
    paths, labels, _ = load_dataset(data)
    pixels = _preprocess_all(paths, hp2, 1)
    assert evaluate(params, hp2, pixels, labels, batch=4) >= 0.9
    out = str(tmp_path / "ft.gguf")
    save_params(out, params, hp2, id2label=dict(enumerate(classes)))
    engine = VitEngine(out, verbose=False)
    top = engine.classify_file(paths[0], topk=1, verbose=False)[0]
    assert top[0] == 0

    # invalid combos are rejected up front
    with pytest.raises(ValueError, match="freeze-backbone"):
        finetune(base, data, epochs=1, batch=4, lora=4,
                 freeze_backbone=True, log=lambda m: None)
    with pytest.raises(ValueError, match="grad-accum"):
        finetune(base, data, epochs=1, batch=4, lora=4, grad_accum=2,
                 log=lambda m: None)
    with pytest.raises(ValueError, match="mixup"):
        finetune(base, data, epochs=1, batch=4, lora=4, mixup=0.2,
                 log=lambda m: None)


@pytest.mark.slow
def test_finetune_lora_resume_guard_and_ckpt(tmp_path):
    """LoRA runs checkpoint/resume their small trainable tree; rank or
    alpha changes are rejected by the run-meta guard."""
    from tests.test_finetune import _make_dataset
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=7,
        patch_size=8,
        img_size=32,
    )
    base = str(tmp_path / "m.gguf")
    write_synthetic_model(base, hp, ftype=1, seed=4)
    data = _make_dataset(tmp_path / "train")
    ck = str(tmp_path / "ck")
    p1, _, _, _ = finetune(
        base, data, epochs=2, batch=4, lr=1e-2, lora=4, ckpt_dir=ck,
        log=lambda m: None,
    )
    # resume with identical settings continues cleanly
    p2, _, _, _ = finetune(
        base, data, epochs=2, batch=4, lr=1e-2, lora=4, ckpt_dir=ck,
        log=lambda m: None,
    )
    np.testing.assert_array_equal(
        np.asarray(p1["head"]["kernel"]), np.asarray(p2["head"]["kernel"])
    )
    with pytest.raises(ValueError, match="different settings"):
        finetune(base, data, epochs=3, batch=4, lr=1e-2, lora=8,
                 ckpt_dir=ck, log=lambda m: None)
