"""V-MoE sparse expert MLPs (ops/moe.py, models/vit.py MoE path).

Mechanism tests, CPU: the dispatch/combine one-hot GEMMs against a
scalar-loop numpy oracle (GShard slot-major drop priority included),
the sparse-upcycling function-preservation invariant (Komatsuzaki et
al. 2023 — identical experts + renormalized top-k gates reproduce the
dense model), file round trip (export -> gguf -> infer_moe_hparams ->
load, bit-exact), quantize behavior (experts quantize, the router
stays float), fold/W8A8 serving, the training objective (router aux
losses, grads reach the router), fine-tune upcycling + resume pinning,
and mesh serving with the experts sharded over the "model" axis.
Reference anchor: the reference graph is dense-only (vit.cpp:791-894);
MoE is a beyond-reference capability and carries its own oracle here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import forward, params_from_state_dict
from vit_cpp_tpu.ops.moe import moe_capacity, moe_mlp, upcycle_params
from vit_cpp_tpu.testing.synthetic import random_state_dict

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_classes=16,
    patch_size=8,
    img_size=32,
)


def _moe_hp(hp=TINY, e=4, layers=(1, 3), k=2, cap=4.0):
    return dataclasses.replace(
        hp, num_experts=e, moe_layers=layers, moe_top_k=k, moe_capacity=cap
    )


def _upcycled(hp=TINY, e=4, layers=(1, 3), k=2, cap=4.0, seed=0):
    params = params_from_state_dict(random_state_dict(hp, seed=seed), hp)
    return upcycle_params(params, hp, e, layers, seed=seed), _moe_hp(
        hp, e, layers, k, cap
    )


def _images(n=2, seed=0, size=32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, 3, size, size)), jnp.float32)


def test_capacity_is_static_aligned_and_capped():
    # hand-computed: ceil(2*197*1.25/8) = ceil(61.5625) = 62, rounded up
    # to the next multiple of 8 = 64 (independent constant, not a
    # re-derivation of the implementation's formula)
    assert moe_capacity(197, 8, 2, 1.25) == 64
    assert moe_capacity(17, 4, 2, 1.25) % 8 == 0
    # a buffer larger than k*T can never fill
    assert moe_capacity(16, 2, 1, 100.0) == 16


def _moe_oracle(y, mp, hp, act):
    """Scalar-loop replica of moe_mlp: top-k routing, renormalized
    gates, GShard slot-major capacity priority (every token's slot-0
    choice claims capacity before any token's slot-1 choice; within a
    slot, token order), dropped assignments contribute zero."""
    b, t, h = y.shape
    e, k = hp.num_experts, hp.moe_top_k
    cap = moe_capacity(t, e, k, hp.moe_capacity)
    out = np.zeros((b, t, h), np.float64)
    dropped = 0
    for bi in range(b):
        # Routing DECISIONS (top-k order, gates) come from the same f32
        # logits moe_mlp routes on — a near-tie between experts must
        # order identically in oracle and implementation. Only the
        # expert MLP accumulation below runs in f64.
        logits32 = y[bi].astype(np.float32) @ np.asarray(
            mp["router"]["kernel"], np.float32
        )
        logits = logits32.astype(np.float64)
        order = np.argsort(-logits32, axis=-1, kind="stable")[:, :k]
        counts = np.zeros(e, np.int64)
        keep = np.zeros((t, k), bool)
        for slot in range(k):
            for ti in range(t):
                ex = order[ti, slot]
                if counts[ex] < cap:
                    keep[ti, slot] = True
                counts[ex] += 1
        for ti in range(t):
            sel = logits[ti, order[ti]]
            gates = np.exp(sel - sel.max())
            gates = gates / gates.sum()
            for slot in range(k):
                if not keep[ti, slot]:
                    dropped += 1
                    continue
                ex = order[ti, slot]
                f1 = y[bi, ti].astype(np.float64) @ np.asarray(
                    mp["fc1"]["kernel"][ex], np.float64
                ) + np.asarray(mp["fc1"]["bias"][ex], np.float64)
                f2 = np.asarray(act(jnp.asarray(f1)), np.float64) @ np.asarray(
                    mp["fc2"]["kernel"][ex], np.float64
                ) + np.asarray(mp["fc2"]["bias"][ex], np.float64)
                out[bi, ti] += gates[slot] * f2
    return out, dropped / (b * t * k)


@pytest.mark.parametrize("k,capf", [(1, 4.0), (2, 4.0), (2, 0.4)])
def test_moe_mlp_matches_scalar_oracle(k, capf):
    """Dispatch/combine GEMMs == per-token scalar routing, including
    under capacity pressure (capf=0.4 drops a large fraction)."""
    rng = np.random.default_rng(3)
    # t=67 makes the capf=0.4 case drop by pigeonhole: total capacity
    # e*cap = 4*16 = 64 < k*t = 134 assignments
    b, t, h, m, e = 2, 67, 16, 24, 4
    hp = dataclasses.replace(
        _moe_hp(e=e, k=k, cap=capf), hidden_size=h, mlp_hidden=m
    )
    y = rng.standard_normal((b, t, h)).astype(np.float32)
    mp = {
        "router": {
            "kernel": jnp.asarray(rng.standard_normal((h, e)), jnp.float32)
        },
        "fc1": {
            "kernel": jnp.asarray(
                rng.standard_normal((e, h, m)) / np.sqrt(h), jnp.float32
            ),
            "bias": jnp.asarray(rng.standard_normal((e, m)), jnp.float32),
        },
        "fc2": {
            "kernel": jnp.asarray(
                rng.standard_normal((e, m, h)) / np.sqrt(m), jnp.float32
            ),
            "bias": jnp.asarray(rng.standard_normal((e, h)), jnp.float32),
        },
    }
    out, aux = moe_mlp(jnp.asarray(y), mp, hp, jax.nn.gelu)
    want, want_dropped = _moe_oracle(y, mp, hp, jax.nn.gelu)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4, rtol=2e-4)
    assert float(aux["dropped_frac"]) == pytest.approx(want_dropped, abs=1e-6)
    if capf < 1:
        assert want_dropped > 0  # the pressure case actually drops


def test_upcycling_is_function_preserving():
    """Identical experts + renormalized top-k gates == the dense MLP, so
    the upcycled model computes the dense model's logits at init (the
    property that makes vit-finetune --moe a safe warm start)."""
    hp = TINY
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
    dense = forward(params, _images(), hp)
    up, hp_moe = _upcycled()
    routed = forward(up, _images(), hp_moe)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(dense), atol=2e-5, rtol=2e-5
    )
    # and the aux diagnostics exist and are sane at init
    logits, aux = forward(up, _images(), hp_moe, moe_aux=True)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(routed))
    assert float(aux["dropped_frac"]) == 0.0  # capacity 4.0 drops nothing
    assert float(aux["load_balance"]) > 0.0
    assert np.isfinite(float(aux["router_z"]))


def test_upcycle_validation():
    hp = TINY
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
    with pytest.raises(ValueError, match="out of range"):
        upcycle_params(params, hp, 4, (1, 99))
    with pytest.raises(ValueError, match="duplicate"):
        upcycle_params(params, hp, 4, (1, 1))
    with pytest.raises(ValueError, match="dense-MLP layer"):
        upcycle_params(params, hp, 4, (0, 1, 2, 3))
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8

    with pytest.raises(ValueError, match="dense kernels"):
        upcycle_params(convert_params_to_int8(params), hp, 4, (1,))


def test_forward_guards():
    up, hp_moe = _upcycled()
    with pytest.raises(ValueError, match="tome"):
        forward(up, _images(), hp_moe, tome=2)
    with pytest.raises(ValueError, match="pad_tokens"):
        forward(up, _images(), hp_moe, pad_tokens=True)
    params = params_from_state_dict(random_state_dict(TINY, seed=0), TINY)
    with pytest.raises(ValueError, match="moe_aux"):
        forward(params, _images(), TINY, moe_aux=True)


def test_file_roundtrip_and_family_inference(tmp_path):
    """export -> gguf (meta.moe marker) -> detect_hparams infers the
    expert layout -> load_params rebuilds the pytree bit-exactly."""
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.models.export import save_params

    up, hp_moe = _upcycled(k=2, cap=2.0)
    ref = forward(up, _images(), hp_moe)
    path = str(tmp_path / "moe.gguf")
    save_params(path, up, hp_moe, ftype=0)
    mf = read_model(path)
    hp2 = detect_hparams(mf)
    assert hp2.num_experts == 4
    assert hp2.moe_layers == (1, 3)
    assert hp2.moe_top_k == 2 and hp2.moe_capacity == 2.0
    assert len(mf.tensors) == hp2.expected_tensor_count()
    got = forward(load_params(mf), _images(), hp2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_marker_is_required_and_validated(tmp_path):
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.models.params import infer_moe_hparams

    up, hp_moe = _upcycled()
    path = str(tmp_path / "moe.gguf")
    save_params(path, up, hp_moe, ftype=0)
    mf = read_model(path)
    tensors = dict(mf.tensors)
    del tensors["meta.moe"]
    with pytest.raises(ValueError, match="meta.moe"):
        infer_moe_hparams(TINY, tensors)
    bad = dict(mf.tensors)
    rec = bad["meta.moe"]
    orig = rec.data.copy()  # rec is shared with mf.tensors — restore below
    rec.data[:] = [9.0, 1.25]  # top_k 9 > 4 experts
    with pytest.raises(ValueError, match="top_k"):
        infer_moe_hparams(TINY, bad)
    rec.data[:] = [1.0, -1.0]
    with pytest.raises(ValueError, match="capacity"):
        infer_moe_hparams(TINY, bad)
    rec.data[:] = orig  # the every-layer check below must read a VALID marker
    with pytest.raises(ValueError, match="every-layer"):
        load_params(
            mf, hparams=_moe_hp(layers=tuple(range(TINY.num_hidden_layers)))
        )


def test_f16_save_keeps_router_f32(tmp_path):
    """ftype=1 export: expert kernels take the f16 2-D rule, the router
    keeps f32 (its top-k boundaries decide WHICH compute runs — same
    rationale as the quantizer's router exemption)."""
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.gguf.dtypes import GGMLDType
    from vit_cpp_tpu.models.export import save_params

    up, hp_moe = _upcycled()
    path = str(tmp_path / "moe16.gguf")
    save_params(path, up, hp_moe, ftype=1)
    mf = read_model(path)
    assert mf.tensors["blocks.1.moe.router.weight"].dtype == GGMLDType.F32
    assert (
        mf.tensors["blocks.1.moe.experts.0.fc1.weight"].dtype
        == GGMLDType.F16
    )


def test_quantize_keeps_router_float_and_serves(tmp_path):
    """vit-quantize on an MoE file: expert kernels quantize (disk
    shrinks), the router stays float (its top-k boundaries decide WHICH
    compute runs); the engine detects + serves the quantized file, and
    W8A8 + fold-ln (the flagship serving config) runs on it with ln2
    kept real (it feeds router AND experts — models/fold.py)."""
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.gguf.dtypes import GGMLDType
    from vit_cpp_tpu.models.export import save_params

    up, hp_moe = _upcycled()
    f32, q8 = str(tmp_path / "m.gguf"), str(tmp_path / "q.gguf")
    save_params(f32, up, hp_moe, ftype=0)
    assert quantize_model_file(f32, q8, 8, verbose=False)
    mfq = read_model(q8)
    assert mfq.tensors["blocks.1.moe.router.weight"].dtype == GGMLDType.F32
    assert mfq.tensors["blocks.1.moe.experts.0.fc1.weight"].dtype == GGMLDType.Q8_0
    assert mfq.tensors["blocks.0.mlp.fc1.weight"].dtype == GGMLDType.Q8_0

    dense_probs = VitEngine(f32, verbose=False).predict_probs_batch(_images())
    for kw in ({}, dict(mm_impl="int8", fold_ln=True)):
        eng = VitEngine(q8, verbose=False, **kw)
        assert eng.hp.num_experts == 4
        probs = eng.predict_probs_batch(_images())
        assert np.isfinite(np.asarray(probs)).all()
        # quantization moves probabilities but not out of this world
        assert np.max(np.abs(np.asarray(probs) - np.asarray(dense_probs))) < 0.35


def test_moe_composes_with_features_and_gap():
    """MoE is an MLP-half substitution, so it must compose with the
    readout variants: features=True (embeddings) and CLS-less
    global-average-pool checkpoints — both function-preserving at
    upcycle init like the classifier path."""
    # embeddings: routed forward(features=True) == dense at init
    hp = TINY
    params = params_from_state_dict(random_state_dict(hp, seed=5), hp)
    up = upcycle_params(params, hp, 4, (1, 3), seed=5)
    hp_moe = _moe_hp(hp)
    dense = forward(params, _images(seed=5), hp, features=True)
    routed = forward(up, _images(seed=5), hp_moe, features=True)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(dense), atol=2e-5, rtol=2e-5
    )
    # CLS-less avg-pool family (MAE/DeiT3): same invariant
    hp_gap = dataclasses.replace(
        TINY, num_prefix_tokens=0, global_pool="avg"
    )
    pg = params_from_state_dict(random_state_dict(hp_gap, seed=6), hp_gap)
    upg = upcycle_params(pg, hp_gap, 4, (1, 3), seed=6)
    hpg_moe = dataclasses.replace(
        hp_gap, num_experts=4, moe_layers=(1, 3), moe_top_k=2,
        moe_capacity=4.0,
    )
    want = forward(pg, _images(seed=6), hp_gap)
    got = forward(upg, _images(seed=6), hpg_moe)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_engine_guards_static_scales_and_tome(tmp_path):
    """VitEngine rejects the two serving knobs that cannot compose with
    a routed layer loop, with clear messages at construction time
    (instead of a calibrator shape error / forward trace error later)."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.models.export import save_params

    up, hp_moe = _upcycled()
    path = str(tmp_path / "moe.gguf")
    save_params(path, up, hp_moe, ftype=0)
    with pytest.raises(ValueError, match="static act scales"):
        VitEngine(path, verbose=False, mm_impl="int8", act_quant="static")
    with pytest.raises(ValueError, match="tome"):
        VitEngine(path, verbose=False, tome=2)


def test_train_objective_reaches_router():
    """cross_entropy_loss adds the Switch balance + z-loss terms for MoE
    models and their gradients reach the router weights."""
    from vit_cpp_tpu.parallel.train import cross_entropy_loss

    up, hp_moe = _upcycled(cap=1.25)
    labels = jnp.asarray([1, 2], jnp.int32)
    loss, grads = jax.value_and_grad(cross_entropy_loss)(
        up, _images(), labels, hp_moe
    )
    assert np.isfinite(float(loss))
    g = np.asarray(grads["moe"]["router"]["kernel"])
    assert np.abs(g).max() > 0.0
    ge = np.asarray(grads["moe"]["fc1"]["kernel"])
    assert np.abs(ge).max() > 0.0


def test_finetune_moe_learns_and_meta_pins_layout(tmp_path):
    """vit-finetune --moe: upcycle, train, export; the output gguf
    declares the experts and continues training without --moe; resuming
    an upcycled run from a dense checkpoint directory is rejected."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    from tests.test_finetune import _make_dataset

    hp = dataclasses.replace(TINY, num_classes=5, num_hidden_layers=3)
    model = str(tmp_path / "m.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=4)
    data = _make_dataset(tmp_path / "train")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "moe_out.gguf")
    params, hpo, classes, losses = finetune(
        model, data, epochs=2, batch=4, lr=1e-3, moe=2, moe_every=2,
        moe_top_k=1, moe_capacity=2.0, ckpt_dir=ckpt,
        log=lambda m: None,
    )
    assert hpo.num_experts == 2 and hpo.moe_layers == (1,)
    assert losses[-1] < losses[0]
    save_params(
        out, params, hpo, id2label=dict(enumerate(classes)), ftype=1
    )
    # the exported checkpoint serves as an MoE model and separates the
    # classes through the routed graph
    eng = VitEngine(out, verbose=False)
    assert eng.hp.num_experts == 2
    import glob

    dark = sorted(glob.glob(str(tmp_path / "train" / "aa_dark" / "*.png")))
    bright = sorted(
        glob.glob(str(tmp_path / "train" / "bb_bright" / "*.png"))
    )
    top_dark = eng.classify_file(dark[0], topk=1, verbose=False)[0][0]
    top_bright = eng.classify_file(bright[0], topk=1, verbose=False)[0][0]
    assert top_dark != top_bright
    # upcycling on top of an already-MoE checkpoint is rejected
    with pytest.raises(ValueError, match="already MoE"):
        finetune(out, data, epochs=1, batch=4, moe=2, log=lambda m: None)
    # continue-training the MoE file (no --moe) reuses the layout
    params2, hpo2, _, _ = finetune(
        out, data, epochs=1, batch=4, lr=1e-4, log=lambda m: None
    )
    assert hpo2.num_experts == 2 and hpo2.moe_layers == (1,)
    # resuming with a different expert config is a different objective
    with pytest.raises(ValueError, match="moe"):
        finetune(
            model, data, epochs=3, batch=4, lr=1e-3, moe=4,
            moe_capacity=2.0, ckpt_dir=ckpt, log=lambda m: None,
        )


def test_finetune_moe_flag_validation(tmp_path):
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    from tests.test_finetune import _make_dataset

    model = str(tmp_path / "m.gguf")
    write_synthetic_model(model, TINY, ftype=1, seed=4)
    data = _make_dataset(tmp_path / "train")
    for kw, msg in [
        (dict(moe=1), ">= 2 experts"),
        (dict(moe=2, moe_top_k=3), "top-k"),
        (dict(moe=2, moe_capacity=0.0), "capacity"),
        (dict(moe=2, tome=2), "tome"),
        (dict(moe=2, qat="q8_0"), "qat"),
        (dict(moe=2, lora=4), "lora"),
        (dict(moe=2, freeze_backbone=True), "freeze-backbone"),
        (dict(moe=2, moe_every=0), "moe-every"),
    ]:
        with pytest.raises(ValueError, match=msg):
            finetune(model, data, epochs=1, batch=4, log=lambda m: None, **kw)


@pytest.mark.slow
def test_moe_serves_sharded_on_mesh(tmp_path):
    """Expert parallelism: the stacked (Lm, E, ...) expert kernels shard
    E over "model" (param_pspecs) and the mesh forward matches the
    single-device forward."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.parallel.mesh import make_mesh

    up, hp_moe = _upcycled()
    path = str(tmp_path / "moe.gguf")
    save_params(path, up, hp_moe, ftype=0)
    single = VitEngine(path, verbose=False)
    want = np.asarray(single.predict_probs_batch(_images(n=8)))
    mesh = make_mesh(dp=4, tp=2)
    sharded = VitEngine(path, verbose=False).shard(mesh)
    got = np.asarray(sharded.predict_probs_batch(_images(n=8)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
