"""ToMe token merging (ops/tome.py, models/vit.py tome path).

Mechanism tests, CPU: the bipartite soft matching against a scalar-loop
numpy oracle, proportional attention in the fused kernels vs the XLA
log-bias form, the identical-patch losslessness invariant, schedule
clamping, family coverage (avg-pool / distilled / headless), and the
engine/CLI/AOT wiring. (Accuracy-vs-r on real weights is the paper's
published table — no pretrained checkpoints exist in this harness.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import forward, params_from_state_dict
from vit_cpp_tpu.ops.tome import tome_merge, tome_schedule
from vit_cpp_tpu.testing.synthetic import random_state_dict

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_classes=16,
    patch_size=8,
    img_size=32,
)


def _merge_oracle(x, metric, sizes, r, n_prefix):
    """Scalar-loop reference of one batch element's bipartite merge."""
    xp, mp, sp = x[n_prefix:], metric[n_prefix:], sizes[n_prefix:]
    mp = mp / np.maximum(np.linalg.norm(mp, axis=-1, keepdims=True), 1e-6)
    a_idx, b_idx = list(range(0, len(xp), 2)), list(range(1, len(xp), 2))
    scores = mp[a_idx] @ mp[b_idx].T
    node_max = scores.max(axis=1)
    node_idx = scores.argmax(axis=1)
    src = sorted(np.argsort(-node_max)[:r])  # merged A positions
    num = {j: sp[b_idx[j]] * xp[b_idx[j]].astype(np.float64) for j in range(len(b_idx))}
    den = {j: sp[b_idx[j]] for j in range(len(b_idx))}
    for i in src:
        j = node_idx[i]
        num[j] = num[j] + sp[a_idx[i]] * xp[a_idx[i]].astype(np.float64)
        den[j] = den[j] + sp[a_idx[i]]
    keep = [i for i in range(len(a_idx)) if i not in src]
    xa = [xp[a_idx[i]] for i in keep]
    sa = [sp[a_idx[i]] for i in keep]
    xb = [num[j] / den[j] for j in range(len(b_idx))]
    sb = [den[j] for j in range(len(b_idx))]
    x_new = np.concatenate([x[:n_prefix], np.stack(xa), np.stack(xb)])
    s_new = np.concatenate([sizes[:n_prefix], np.array(sa), np.array(sb)])
    return x_new.astype(np.float32), s_new.astype(np.float32)


def test_merge_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    b, t, h, d, r, npfx = 3, 17, 8, 6, 4, 1
    x = rng.standard_normal((b, t, h)).astype(np.float32)
    m = rng.standard_normal((b, t, d)).astype(np.float32)
    s = rng.uniform(1, 4, (b, t)).astype(np.float32)
    xn, sn = tome_merge(jnp.asarray(x), jnp.asarray(m), jnp.asarray(s), r, npfx)
    assert xn.shape == (b, t - r, h) and sn.shape == (b, t - r)
    for i in range(b):
        xo, so = _merge_oracle(x[i], m[i], s[i], r, npfx)
        np.testing.assert_allclose(np.asarray(xn[i]), xo, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sn[i]), so, atol=1e-6)


def test_merge_protects_prefix_tokens():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 8)).astype(np.float32)
    m = rng.standard_normal((2, 12, 4)).astype(np.float32)
    s = np.ones((2, 12), np.float32)
    xn, sn = tome_merge(jnp.asarray(x), jnp.asarray(m), jnp.asarray(s), 2, 3)
    # the three prefix rows (CLS + dist + register layouts) pass through
    np.testing.assert_array_equal(np.asarray(xn[:, :3]), x[:, :3])
    np.testing.assert_array_equal(np.asarray(sn[:, :3]), s[:, :3])
    # total size is conserved: merged tokens carry their counts
    np.testing.assert_allclose(np.asarray(jnp.sum(sn, axis=1)), 12.0, atol=1e-5)


def test_schedule_clamps_to_half():
    # 16 patches, huge r: at most half the remaining tokens merge per
    # layer, so at least one patch always survives
    rs = tome_schedule(16, 5, 100)
    assert rs == [8, 4, 2, 1, 0]
    assert tome_schedule(196, 12, 8) == [8] * 12
    with pytest.raises(ValueError):
        tome_schedule(16, 2, 0)


@pytest.mark.slow
def test_proportional_attention_kernels_match_xla_bias():
    from vit_cpp_tpu.ops.flash_attention import (
        _attention_qkv_xla,
        attention_qkv,
    )

    rng = np.random.default_rng(2)
    # full-block generic kernel: h=64, nh=2 (d=32)
    qkv = jnp.asarray(rng.standard_normal((2, 17, 3 * 64)), jnp.float32)
    sizes = jnp.asarray(rng.uniform(1, 5, (2, 17)), jnp.float32)
    ref = _attention_qkv_xla(qkv, 2, sizes=sizes)
    got = attention_qkv(qkv, 2, sizes=sizes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # masked head-pair kernel: h=128, nh=2 (d=64, T<=600)
    qkv2 = jnp.asarray(rng.standard_normal((2, 17, 3 * 128)), jnp.float32)
    sizes2 = jnp.asarray(rng.uniform(1, 5, (2, 17)), jnp.float32)
    got2 = attention_qkv(qkv2, 2, sizes=sizes2)
    ref2 = _attention_qkv_xla(qkv2, 2, sizes=sizes2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-5)
    # sizes == 1 reduces to plain attention
    ones = jnp.ones((2, 17), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(attention_qkv(qkv, 2, sizes=ones)),
        np.asarray(attention_qkv(qkv, 2)),
        atol=2e-5,
    )


def test_proportional_attention_lane_kernel():
    from vit_cpp_tpu.ops.flash_attention import (
        _attention_qkv_lane,
        _attention_qkv_xla,
    )

    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.standard_normal((1, 9, 3 * 128)), jnp.bfloat16)
    sizes = jnp.asarray(rng.uniform(1, 3, (1, 9)), jnp.float32)
    got = _attention_qkv_lane(qkv, 2, False, True, sizes=sizes)
    ref = _attention_qkv_xla(qkv, 2, sizes=sizes)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


@pytest.mark.slow
def test_identical_patches_merge_losslessly():
    """When every patch is the same, any merge is exact: the tome forward
    must reproduce the full forward's logits."""
    params = params_from_state_dict(random_state_dict(TINY, seed=7), TINY)
    rng = np.random.default_rng(4)
    one = rng.standard_normal((3, 8, 8))
    tile = np.tile(one, (1, 4, 4))
    imgs = jnp.asarray(np.stack([tile, tile * 0.5]), jnp.float32)
    base = forward(params, imgs, TINY)
    merged = forward(params, imgs, TINY, tome=2)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(base), atol=1e-4, rtol=1e-4
    )


def test_tome_forward_shapes_and_plausibility():
    params = params_from_state_dict(random_state_dict(TINY, seed=7), TINY)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    base = forward(params, imgs, TINY)
    merged = forward(params, imgs, TINY, tome=2)
    assert merged.shape == base.shape
    # random weights: merged logits differ but stay in the same range
    assert float(jnp.max(jnp.abs(merged - base))) > 0
    assert float(jnp.max(jnp.abs(merged))) < 10 * float(jnp.max(jnp.abs(base))) + 1
    # features path works too
    feats = forward(params, imgs, TINY, tome=2, features=True)
    assert feats.shape == (2, TINY.hidden_size)


@pytest.mark.slow
def test_tome_avg_pool_weights_by_size():
    hp = dataclasses.replace(
        TINY, global_pool="avg", num_prefix_tokens=0
    )
    params = params_from_state_dict(random_state_dict(hp, seed=9), hp)
    rng = np.random.default_rng(6)
    one = rng.standard_normal((3, 8, 8))
    imgs = jnp.asarray(np.tile(one, (1, 4, 4))[None], jnp.float32)
    base = forward(params, imgs, hp)
    merged = forward(params, imgs, hp, tome=3)
    # identical patches + size-weighted mean: lossless through avg pool
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(base), atol=1e-4, rtol=1e-4
    )


def test_tome_rejects_vitstr_and_pad_tokens():
    hp = dataclasses.replace(TINY, seq_len=4, in_chans=1, num_classes=8)
    params = params_from_state_dict(random_state_dict(hp, seed=1), hp)
    imgs = jnp.zeros((1, 1, 32, 32), jnp.float32)
    with pytest.raises(ValueError, match="sequence heads"):
        forward(params, imgs, hp, tome=2)
    params2 = params_from_state_dict(random_state_dict(TINY, seed=1), TINY)
    imgs2 = jnp.zeros((1, 3, 32, 32), jnp.float32)
    with pytest.raises(ValueError, match="exclusive"):
        forward(
            params2, imgs2, TINY, tome=2, pad_tokens=True, attn_impl="pallas"
        )


@pytest.mark.slow
def test_tome_trains_grads_flow_and_match_xla_path():
    """ToMe training (r4): the merged graph differentiates — the
    train-entry config (pallas-train + remat, which the tome path maps
    to XLA attention + per-block checkpoint) produces the same loss AND
    gradients as the plain XLA forward, grads reach every block weight,
    and the matching itself is stop_gradient'd (official no_grad
    semantics, ops/tome.py)."""
    params = params_from_state_dict(random_state_dict(TINY, seed=5), TINY)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray([1, 3])

    def loss(p, **fkw):
        logits = forward(p, imgs, TINY, tome=2, **fkw)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.mean(-jnp.take_along_axis(logp, labels[:, None], axis=-1))

    l0, g0 = jax.value_and_grad(loss)(params)
    l1, g1 = jax.value_and_grad(loss)(
        params, attn_impl="pallas-train", remat="dots+attn"
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )
    # every block weight receives gradient (the merge GEMM is not a
    # gradient sink) and nothing is NaN
    for leaf in jax.tree.leaves(g1):
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all()
    qkv_g = np.asarray(g1["blocks"]["qkv"]["kernel"])
    assert np.abs(qkv_g).max() > 0


@pytest.mark.slow
def test_finetune_with_tome_learns_and_meta_pins_r(tmp_path):
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = dataclasses.replace(TINY, num_classes=5)
    model = str(tmp_path / "m.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=4)

    from tests.test_finetune import _make_dataset

    data = _make_dataset(tmp_path / "train")
    ckpt = str(tmp_path / "ckpt")
    params, hpo, classes, losses = finetune(
        model, data, epochs=2, batch=4, lr=1e-3, tome=2,
        ckpt_dir=ckpt, log=lambda m: None,
    )
    assert losses[-1] < losses[0]
    # the trained checkpoint separates the classes THROUGH the merged
    # graph (what --tome serving will run)
    from vit_cpp_tpu.finetune import _preprocess_all, evaluate, load_dataset

    paths, labels, _ = load_dataset(data)
    pixels = _preprocess_all(paths, hpo, 1)
    assert evaluate(params, hpo, pixels, labels, batch=4, tome=2) >= 0.9
    # resuming with a different r is a different objective — rejected
    with pytest.raises(ValueError, match="tome"):
        finetune(
            model, data, epochs=3, batch=4, lr=1e-3, tome=4,
            ckpt_dir=ckpt, log=lambda m: None,
        )


@pytest.mark.slow
def test_tome_through_quant_and_pallas_paths(tmp_path):
    """The serving configs: Q8_0 QuantLinear, W8A8 Int8Linear, fused
    pallas attention — the per-layer slice_block_params path must carry
    quant leaves through the unrolled tome loop."""
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    f16, q8 = str(tmp_path / "m.gguf"), str(tmp_path / "q.gguf")
    write_synthetic_model(f16, TINY, ftype=1, seed=0)
    quantize_model_file(f16, q8, 8, verbose=False)
    params = load_params(read_model(q8), hparams=TINY)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    dense = forward(params, imgs, TINY, tome=2)
    assert dense.shape == (2, 16)
    pall = forward(params, imgs, TINY, tome=2, attn_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(pall), np.asarray(dense), atol=2e-3, rtol=2e-3
    )
    w8 = convert_params_to_int8(params)
    int8 = forward(w8, imgs, TINY, tome=2, mm_impl="int8")
    assert np.isfinite(np.asarray(int8)).all()


@pytest.mark.slow
def test_tome_engine_and_aot_roundtrip(tmp_path):
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    path = str(tmp_path / "m.gguf")
    write_synthetic_model(path, TINY, ftype=1, seed=0)
    eng = VitEngine(path, tome=2, verbose=False)
    rng = np.random.default_rng(8)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    probs = eng.predict_probs_batch(imgs)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(probs, axis=-1)), 1.0, atol=1e-5
    )
    vitx = str(tmp_path / "m.vitx")
    meta = save_engine(eng, vitx, batch=2)
    assert meta["tome"] == 2
    aot = AotEngine(vitx)
    np.testing.assert_allclose(
        np.asarray(aot.predict_probs_batch(imgs)),
        np.asarray(probs),
        atol=1e-5,
    )


def test_tome_engine_rejects_vitstr(tmp_path):
    from vit_cpp_tpu.engine import VitstrEngine
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = dataclasses.replace(
        TINY, seq_len=4, in_chans=1, num_classes=8
    )
    path = str(tmp_path / "s.gguf")
    write_synthetic_model(path, hp, ftype=1, seed=0)
    with pytest.raises(ValueError, match="sequence-head"):
        VitstrEngine(path, tome=2, verbose=False)
