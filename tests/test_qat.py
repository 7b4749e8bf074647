"""QAT (quant/qat.py): the fake-quant chain is bit-identical to the
serving codecs (blocks.quantize -> dequantize -> channelwise int8),
gradients are straight-through, fake_quant_params hits exactly the
leaves the serving quantizer targets, mm_impl="qat" matches the real
W8A8 forward, and the fine-tune loop trains through the noise so the
exported quantized model is what the loss optimized."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.quant.qat import (
    QAT_FORMATS,
    fake_quant_act,
    fake_quant_params,
    fake_quant_weight,
)

BLOCK_FORMATS = [f for f in QAT_FORMATS if f != "w8a8"]

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=16,
    patch_size=8,
    img_size=32,
)


def _serving_block_qdq(w: np.ndarray, fmt: str) -> np.ndarray:
    """The REAL on-disk round trip: pack (out, in)-layout blocks with
    quant/blocks.quantize, dequantize, return (in, out) f32."""
    from vit_cpp_tpu.gguf.dtypes import GGMLDType
    from vit_cpp_tpu.quant import blocks

    dt = GGMLDType[fmt.upper()]
    packed = blocks.quantize(np.ascontiguousarray(w.T), dt)
    return blocks.dequantize(packed, w.size, dt).reshape(w.T.shape).T


@pytest.mark.parametrize("fmt", BLOCK_FORMATS)
def test_fake_quant_weight_bit_matches_serving_chain(fmt):
    """fake_quant_weight == channelwise_int8(dequant(block_quantize(w)))
    bit for bit — the exact arithmetic a quantized checkpoint sees on
    the W8A8 path (gguf blocks -> QuantLinear -> from_quant_linear)."""
    from vit_cpp_tpu.quant.int8 import channelwise_int8

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    w_blk = _serving_block_qdq(w, fmt)
    serving = np.asarray(channelwise_int8(jnp.asarray(w_blk)).dequantize())
    got = np.asarray(fake_quant_weight(jnp.asarray(w), fmt))
    np.testing.assert_array_equal(got, serving)


def test_fake_quant_weight_w8a8_bit_matches_serving_chain():
    """"w8a8" = f16 storage (cli/convert ftype-1) then the load-time
    channelwise int8 (`--quant none --mm int8`)."""
    from vit_cpp_tpu.quant.int8 import channelwise_int8

    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    wf16 = jnp.asarray(w).astype(jnp.float16)
    serving = np.asarray(channelwise_int8(wf16).dequantize())
    got = np.asarray(fake_quant_weight(jnp.asarray(w), "w8a8"))
    np.testing.assert_array_equal(got, serving)


def test_fake_quant_weight_stacked_layers():
    """The scan-stacked (L, in, out) kernels quantize per-layer exactly
    as each layer's 2-D slice would alone (blocks run along in)."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 64, 16)).astype(np.float32)
    got = np.asarray(fake_quant_weight(jnp.asarray(w), "q8_0"))
    for l in range(3):
        ref = np.asarray(fake_quant_weight(jnp.asarray(w[l]), "q8_0"))
        np.testing.assert_array_equal(got[l], ref)


def test_fake_quant_act_matches_w8a8_matmul_quantization():
    """fake_quant_act mirrors the dynamic per-token activation quantize
    inside the W8A8 matmul: y = x_qdq @ dequant(w) reproduces
    w8a8_matmul(x, w) up to f32 dot rounding."""
    from vit_cpp_tpu.ops.pallas_int8_matmul import w8a8_matmul
    from vit_cpp_tpu.quant.int8 import channelwise_int8

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    w = channelwise_int8(
        jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    )
    serving = np.asarray(w8a8_matmul(x, w))
    sim = np.asarray(fake_quant_act(x) @ w.dequantize())
    np.testing.assert_allclose(sim, serving, rtol=1e-5, atol=1e-5)


def test_fake_quant_act_zero_row_and_dtype():
    x = jnp.zeros((2, 32), jnp.bfloat16)
    y = fake_quant_act(x)
    assert y.dtype == jnp.bfloat16
    assert not np.any(np.isnan(np.asarray(y, np.float32)))
    np.testing.assert_array_equal(np.asarray(y, np.float32), 0.0)


@pytest.mark.parametrize("fmt", list(QAT_FORMATS))
def test_weight_gradient_is_straight_through(fmt):
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(fake_quant_weight(w, fmt) * c))(w)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(c))


def test_act_gradient_is_straight_through():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(fake_quant_act(x) * c))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(c))


def _tiny_params(seed=0, hp=TINY):
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    return params_from_state_dict(random_state_dict(hp, seed=seed), hp)


def test_fake_quant_params_targets_serving_leaves_only():
    """Exactly the 2-D `.*weight` positions quantize at load
    (quant/int8.convert_params_to_int8): blocks.{qkv,proj,fc1,fc2} +
    head kernels change; patch_embed, norms, biases, cls/pos stay
    bit-identical."""
    params = _tiny_params()
    q = fake_quant_params(params, "q8_0")
    for name in ("qkv", "proj", "fc1", "fc2"):
        assert not np.array_equal(
            np.asarray(q["blocks"][name]["kernel"]),
            np.asarray(params["blocks"][name]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(q["blocks"][name]["bias"]),
            np.asarray(params["blocks"][name]["bias"]),
        )
    assert not np.array_equal(
        np.asarray(q["head"]["kernel"]), np.asarray(params["head"]["kernel"])
    )
    for name in ("patch_embed", "cls_token", "pos_embed", "norm"):
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(q[name])[0]),
            np.asarray(jax.tree.leaves(params[name])[0]),
        )
    with pytest.raises(ValueError, match="qat format"):
        fake_quant_params(params, "int3")


def test_qat_forward_matches_real_w8a8_serving():
    """forward(fake_quant_params(p, 'w8a8'), mm_impl='qat') reproduces
    the REAL int8-MXU forward on the converted params — the QAT loss is
    optimizing the model that serves."""
    from vit_cpp_tpu.models import forward
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8

    params = _tiny_params(seed=7)
    # the serving side stores f16 (ftype 1) before the int8 conversion;
    # match it so only the matmul arithmetic is under test
    f16_kernels = dict(params)
    blocks = dict(params["blocks"])
    for name in ("qkv", "proj", "fc1", "fc2"):
        leaf = dict(blocks[name])
        leaf["kernel"] = leaf["kernel"].astype(jnp.float16).astype(
            jnp.float32
        )
        blocks[name] = leaf
    f16_kernels["blocks"] = blocks
    head = dict(params["head"])
    head["kernel"] = head["kernel"].astype(jnp.float16).astype(jnp.float32)
    f16_kernels["head"] = head

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    served = np.asarray(
        forward(convert_params_to_int8(f16_kernels), x, TINY, mm_impl="int8")
    )
    qat = np.asarray(
        forward(fake_quant_params(params, "w8a8"), x, TINY, mm_impl="qat")
    )
    np.testing.assert_allclose(qat, served, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(qat.argmax(-1), served.argmax(-1))


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0"])
def test_train_step_qat_descends(fmt):
    """train_step(qat=fmt) optimizes the fake-quantized loss: finite,
    decreasing, and equal to cross_entropy_loss(qat=fmt) at step 0."""
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.train import (
        create_train_state,
        cross_entropy_loss,
        make_optimizer,
        shard_batch,
        train_step,
    )

    params = _tiny_params(seed=9)
    rng = np.random.default_rng(10)
    images = jnp.asarray(
        rng.standard_normal((8, 3, 32, 32)), dtype=jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 16, (8,)), dtype=jnp.int32)
    mesh = make_mesh(dp=8, tp=1)
    optimizer = make_optimizer(lr=1e-3)
    with mesh:
        state = create_train_state(params, mesh, optimizer)
        si, sl = shard_batch(images, labels, mesh)
        loss0 = cross_entropy_loss(state.params, si, sl, TINY, qat=fmt)
        state, loss = train_step(state, si, sl, TINY, optimizer, qat=fmt)
        state, loss2 = train_step(state, si, sl, TINY, optimizer, qat=fmt)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    # rel=1e-2, not the dense path's 1e-5: under value_and_grad the remat
    # recompute fuses differently, and a 1-ulp pre-round difference flips
    # a fake-quant code by a whole quantum
    assert float(loss) == pytest.approx(float(loss0), rel=1e-2)
    assert float(loss2) < float(loss)


def test_fake_quant_act_static_matches_w8a8_static_branch():
    """fake_quant_act_static mirrors the static-scale W8A8 matmul
    (round(clip(x/sx, ±127)) * sx) including clipping of out-of-range
    activations."""
    from vit_cpp_tpu.ops.pallas_int8_matmul import w8a8_matmul
    from vit_cpp_tpu.quant.int8 import channelwise_int8
    from vit_cpp_tpu.quant.qat import fake_quant_act_static

    import dataclasses

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32) * 3)
    w = channelwise_int8(
        jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    )
    # a deliberately TIGHT scale so some tokens clip
    sx = jnp.full((1, 1), 0.01, jnp.float32)
    w_static = dataclasses.replace(w, act_scale=sx)
    served = np.asarray(w8a8_matmul(x, w_static))
    sim = np.asarray(fake_quant_act_static(x, sx) @ w.dequantize())
    np.testing.assert_allclose(sim, served, rtol=1e-5, atol=1e-5)
    # clipping engaged: the qdq'd values saturate at ±127*sx
    q = np.asarray(fake_quant_act_static(x, sx))
    assert q.max() <= 127 * 0.01 + 1e-6 and q.min() >= -127 * 0.01 - 1e-6
    # STE: gradient of identity
    c = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(fake_quant_act_static(x, sx) * c))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(c))


def test_measure_inject_save_load_act_scales(tmp_path):
    """measure_act_scales produces the calibrator's absmax*margin/127
    rule at the right shapes; the JSON sidecar round-trips; inject
    attaches to exactly the serving-quantized sites."""
    from vit_cpp_tpu.quant.qat import (
        inject_act_scales,
        load_act_scales,
        measure_act_scales,
        save_act_scales,
    )

    params = _tiny_params(seed=12)
    rng = np.random.default_rng(13)
    imgs = jnp.asarray(rng.standard_normal((4, 3, 32, 32)).astype(np.float32))
    scales = measure_act_scales(params, imgs, TINY, "q8_0")
    for name in ("qkv", "proj", "fc1", "fc2"):
        assert scales[name].shape == (TINY.num_hidden_layers, 1, 1)
        assert np.all(np.asarray(scales[name]) > 0)
    assert scales["head"].shape == (1, 1)
    f = str(tmp_path / "s.json")
    save_act_scales(f, scales, margin=1.05)
    back = load_act_scales(f)
    for k in scales:
        np.testing.assert_allclose(
            np.asarray(back[k]), np.asarray(scales[k]), rtol=1e-6
        )
    inj = inject_act_scales(params, scales)
    for name in ("qkv", "proj", "fc1", "fc2"):
        assert "act_scale" in inj["blocks"][name]
    assert "act_scale" in inj["head"]
    assert "act_scale" not in inj["patch_embed"]


def test_qat_static_forward_matches_real_static_w8a8_serving(tmp_path):
    """The --qat-act static consistency guarantee: the fake-quant
    static forward reproduces the REAL int8 static-scale forward when
    serving attaches the SAME scales (the exported sidecar path)."""
    from vit_cpp_tpu.models import forward
    from vit_cpp_tpu.quant.calibrate import attach_act_scales
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8
    from vit_cpp_tpu.quant.qat import (
        inject_act_scales,
        load_act_scales,
        measure_act_scales,
        save_act_scales,
    )

    params = _tiny_params(seed=14)
    f16_kernels = dict(params)
    blocks = dict(params["blocks"])
    for name in ("qkv", "proj", "fc1", "fc2"):
        leaf = dict(blocks[name])
        leaf["kernel"] = leaf["kernel"].astype(jnp.float16).astype(
            jnp.float32
        )
        blocks[name] = leaf
    f16_kernels["blocks"] = blocks
    head = dict(params["head"])
    head["kernel"] = head["kernel"].astype(jnp.float16).astype(jnp.float32)
    f16_kernels["head"] = head

    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    scales = measure_act_scales(params, x, TINY, "w8a8")
    f = str(tmp_path / "s.json")
    save_act_scales(f, scales, margin=1.05)
    loaded = load_act_scales(f)

    served = np.asarray(
        forward(
            attach_act_scales(convert_params_to_int8(f16_kernels), loaded),
            x,
            TINY,
            mm_impl="int8",
        )
    )
    from vit_cpp_tpu.quant.qat import fake_quant_params

    qat = np.asarray(
        forward(
            inject_act_scales(fake_quant_params(params, "w8a8"), loaded),
            x,
            TINY,
            mm_impl="qat",
        )
    )
    np.testing.assert_allclose(qat, served, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(qat.argmax(-1), served.argmax(-1))


def test_train_step_qat_static_descends():
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.train import (
        create_train_state,
        make_optimizer,
        shard_batch,
        train_step,
    )
    from vit_cpp_tpu.quant.qat import measure_act_scales

    params = _tiny_params(seed=16)
    rng = np.random.default_rng(17)
    images = jnp.asarray(
        rng.standard_normal((8, 3, 32, 32)), dtype=jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 16, (8,)), dtype=jnp.int32)
    scales = measure_act_scales(params, images, TINY, "q8_0")
    mesh = make_mesh(dp=8, tp=1)
    optimizer = make_optimizer(lr=1e-3)
    with mesh:
        state = create_train_state(params, mesh, optimizer)
        si, sl = shard_batch(images, labels, mesh)
        state, loss = train_step(
            state, si, sl, TINY, optimizer, qat="q8_0", qat_scales=scales
        )
        state, loss2 = train_step(
            state, si, sl, TINY, optimizer, qat="q8_0", qat_scales=scales
        )
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss)


def test_engine_act_scales_rejects_fold_and_dynamic(tmp_path):
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=4,
        patch_size=8,
        img_size=32,
    )
    m = str(tmp_path / "m.gguf")
    write_synthetic_model(m, hp, ftype=1, seed=4)
    with pytest.raises(ValueError, match="act_quant='static'"):
        VitEngine(
            m, mm_impl="int8", act_scales="/nonexistent", verbose=False
        )
    with pytest.raises(ValueError, match="fold_ln"):
        VitEngine(
            m,
            mm_impl="int8",
            act_quant="static",
            fold_ln=True,
            act_scales="/nonexistent",
            verbose=False,
        )


@pytest.mark.slow
def test_finetune_qat_static_learns_and_serves_with_sidecar(tmp_path):
    """--qat-act static end to end: fine-tune with frozen per-tensor
    activation qdq, export the scales sidecar, serve --act static with
    NO calibration pass — the deployed arithmetic is the trained one."""
    from tests.test_finetune import _make_dataset
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune, load_dataset
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
    scales_out = str(tmp_path / "ft.act_scales.json")
    params, hp2, classes, losses = finetune(
        base, data, epochs=4, batch=4, lr=1e-3, qat="q8_0",
        qat_act="static", qat_scales_out=scales_out, log=lambda m: None,
    )
    assert losses[-1] < losses[0]
    import os

    assert os.path.exists(scales_out)
    f16 = str(tmp_path / "ft-f16.gguf")
    q8 = str(tmp_path / "ft-q8_0.gguf")
    save_params(f16, params, hp2, id2label=dict(enumerate(classes)))
    quantize_model_file(f16, q8, 8, verbose=False)
    engine = VitEngine(
        q8, mm_impl="int8", act_quant="static", act_scales=scales_out,
        fold_ln=False, verbose=False,
    )
    assert engine._needs_calibration is False
    paths, labels, _ = load_dataset(data)
    correct = sum(
        engine.classify_file(p, topk=1, verbose=False)[0][0] == int(l)
        for p, l in zip(paths, labels)
    )
    assert correct / len(paths) >= 0.9
    # invalid qat_act rejected; static without qat rejected
    with pytest.raises(ValueError, match="qat_act"):
        finetune(base, data, epochs=1, batch=4, qat="q8_0",
                 qat_act="bogus", log=lambda m: None)
    with pytest.raises(ValueError, match="requires --qat"):
        finetune(base, data, epochs=1, batch=4, qat_act="static",
                 log=lambda m: None)


@pytest.mark.slow
def test_finetune_qat_learns_and_serves_quantized(tmp_path):
    """The production QAT loop: fine-tune through q8_0+W8A8 noise,
    export, quantize with the SAME format, serve on the int8 path —
    the deployed model is the one the loss saw."""
    from tests.test_finetune import _make_dataset
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune, load_dataset
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
        base, data, epochs=4, batch=4, lr=1e-3, qat="q8_0",
        log=lambda m: None,
    )
    assert losses[-1] < losses[0]
    f16 = str(tmp_path / "ft-f16.gguf")
    q8 = str(tmp_path / "ft-q8_0.gguf")
    save_params(f16, params, hp2, id2label=dict(enumerate(classes)))
    quantize_model_file(f16, q8, 8, verbose=False)
    engine = VitEngine(q8, mm_impl="int8", verbose=False)
    paths, labels, _ = load_dataset(data)
    correct = sum(
        engine.classify_file(p, topk=1, verbose=False)[0][0] == int(l)
        for p, l in zip(paths, labels)
    )
    assert correct / len(paths) >= 0.9


@pytest.mark.slow
def test_finetune_qat_resume_mismatch_rejected(tmp_path):
    """Resuming a QAT run with a different (or absent) --qat retargets
    the loss — the run-meta guard must reject it."""
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
    finetune(
        base, data, epochs=1, batch=4, lr=1e-3, qat="q8_0",
        ckpt_dir=ck, log=lambda m: None,
    )
    with pytest.raises(ValueError, match="different settings"):
        finetune(
            base, data, epochs=2, batch=4, lr=1e-3, qat="w8a8",
            ckpt_dir=ck, log=lambda m: None,
        )
    with pytest.raises(ValueError, match="different settings"):
        finetune(
            base, data, epochs=2, batch=4, lr=1e-3,
            ckpt_dir=ck, log=lambda m: None,
        )
