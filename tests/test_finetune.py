"""Fine-tune loop (vit_cpp_tpu/finetune.py + vit-finetune CLI): head
transfer onto a folder taxonomy, loss goes down on a learnable task,
freeze-backbone trains the head only, resume is bit-identical, the mesh
path runs, and the output gguf serves end to end."""

import os

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model


def _make_dataset(root, n_per_class=8, size=32, seed=0):
    """Two trivially separable classes: dark images vs bright images."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for cls, lo, hi in (("aa_dark", 0, 40), ("bb_bright", 210, 255)):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(n_per_class):
            img = rng.integers(lo, hi, (size, size, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=7,
        patch_size=8,
        img_size=32,
    )
    p = tmp_path_factory.mktemp("ft") / "m.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=4)
    return str(p)


@pytest.mark.slow
def test_finetune_learns_and_serves(model_path, tmp_path):
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import evaluate, finetune, load_dataset
    from vit_cpp_tpu.models.export import save_params

    data = _make_dataset(tmp_path / "train")
    params, hp, classes, losses = finetune(
        model_path, data, epochs=4, batch=4, lr=1e-3, log=lambda m: None
    )
    assert classes == ["aa_dark", "bb_bright"]
    assert hp.num_classes == 2  # head transferred from 7 classes
    assert losses[-1] < losses[0]

    # the trained head separates the classes
    from vit_cpp_tpu.finetune import _preprocess_all

    paths, labels, _ = load_dataset(data)
    pixels = _preprocess_all(paths, hp, 1)
    assert evaluate(params, hp, pixels, labels, batch=4) >= 0.9

    # the exported file serves through the normal engine
    out = str(tmp_path / "ft.gguf")
    save_params(out, params, hp, id2label=dict(enumerate(classes)))
    engine = VitEngine(out, verbose=False)
    assert engine.id2label == {0: "aa_dark", 1: "bb_bright"}
    top = engine.classify_file(paths[0], topk=1, verbose=False)[0]
    assert top[0] == 0  # a dark image classifies as class 0


def test_finetuned_model_quantizes_and_serves_w8a8(model_path, tmp_path):
    """The full production loop: fine-tune -> f16 gguf -> Q8_0 quantize ->
    W8A8 int8 serving still separates the classes."""
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune, load_dataset
    from vit_cpp_tpu.models.export import save_params

    data = _make_dataset(tmp_path / "train")
    params, hp, classes, _ = finetune(
        model_path, data, epochs=4, batch=4, lr=1e-3, log=lambda m: None
    )
    f16 = str(tmp_path / "ft-f16.gguf")
    q8 = str(tmp_path / "ft-q8_0.gguf")
    save_params(f16, params, hp, id2label=dict(enumerate(classes)))
    quantize_model_file(f16, q8, 8, verbose=False)

    engine = VitEngine(q8, mm_impl="int8", fold_ln=True, verbose=False)
    paths, labels, _ = load_dataset(data)
    correct = sum(
        engine.classify_file(p, topk=1, verbose=False)[0][0] == int(l)
        for p, l in zip(paths, labels)
    )
    assert correct / len(paths) >= 0.9


def test_freeze_backbone_trains_head_only(model_path, tmp_path):
    import jax
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.finetune import _dense_f32, _reinit_head, finetune
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    data = _make_dataset(tmp_path / "train")
    mf = read_model(model_path)
    hp0 = detect_hparams(mf)
    before, _ = _reinit_head(_dense_f32(load_params(mf, jnp.float32)), hp0, 2)

    params, hp, _, _ = finetune(
        model_path,
        data,
        epochs=2,
        batch=4,
        lr=1e-3,
        freeze_backbone=True,
        log=lambda m: None,
    )
    for key in ("cls_token", "pos_embed", "patch_embed", "blocks", "norm"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            before[key],
            params[key],
        )
    assert not np.array_equal(
        np.asarray(before["head"]["kernel"]), np.asarray(params["head"]["kernel"])
    )


def test_resume_is_bit_identical(model_path, tmp_path):
    import jax

    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    kw = dict(batch=4, lr=1e-3, seed=3, log=lambda m: None)

    straight, _, _, _ = finetune(model_path, data, epochs=3, **kw)

    ck = str(tmp_path / "ckpt")
    finetune(model_path, data, epochs=2, ckpt_dir=ck, **kw)
    resumed, _, _, _ = finetune(model_path, data, epochs=3, ckpt_dir=ck, **kw)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        straight,
        resumed,
    )


def test_ema_lags_raw_weights_and_serves(model_path, tmp_path):
    """--ema returns the weight EMA (timm ModelEma semantics): with a
    decay near 1 the returned params stay close to the init while the raw
    run's move away — and the EMA head still serves/export-round-trips."""
    import jax
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine, detect_hparams
    from vit_cpp_tpu.finetune import _dense_f32, _reinit_head, finetune
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.models.params import load_params

    data = _make_dataset(tmp_path / "train")
    kw = dict(epochs=2, batch=4, lr=1e-3, seed=5, log=lambda m: None)
    raw, hp, classes, _ = finetune(model_path, data, **kw)
    ema, _, _, _ = finetune(model_path, data, ema=0.9, **kw)

    mf = read_model(model_path)
    init, _ = _reinit_head(
        _dense_f32(load_params(mf, jnp.float32)), detect_hparams(mf), 2
    )

    def dist(a, b):
        leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
        return float(sum(jnp.sum((x - y) ** 2) for x, y in zip(leaves_a, leaves_b)))

    # EMA lags: closer to the init than the raw weights are
    assert 0 < dist(ema, init) < dist(raw, init)
    # ...and the EMA relation holds exactly per-step is covered by the
    # resume test below; here just prove the artifact serves
    out = str(tmp_path / "ema.gguf")
    save_params(out, ema, hp, id2label=dict(enumerate(classes)))
    VitEngine(out, verbose=False).classify_file(
        str(tmp_path / "train" / "aa_dark" / "0.png"), topk=1, verbose=False
    )


def test_ema_resume_is_bit_identical(model_path, tmp_path):
    """The EMA tree rides the orbax checkpoint: straight-through and
    resumed runs return the same EMA weights bit-for-bit."""
    import jax

    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    kw = dict(batch=4, lr=1e-3, seed=3, ema=0.8, log=lambda m: None)

    straight, _, _, _ = finetune(model_path, data, epochs=3, **kw)

    ck = str(tmp_path / "ckpt")
    finetune(model_path, data, epochs=2, ckpt_dir=ck, **kw)
    resumed, _, _, _ = finetune(model_path, data, epochs=3, ckpt_dir=ck, **kw)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        straight,
        resumed,
    )


@pytest.mark.slow
def test_grad_accum_matches_big_batch(model_path, tmp_path):
    """grad_accum=2 with batch=4 produces the same updates as one batch=8
    step (mean-of-grads == grad-of-mean for equal micro sizes)."""
    import jax

    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    kw = dict(epochs=2, lr=1e-3, seed=5, log=lambda m: None)
    big, _, _, big_losses = finetune(model_path, data, batch=8, **kw)
    acc, _, _, acc_losses = finetune(
        model_path, data, batch=4, grad_accum=2, **kw
    )
    # not bit-equal: summing micro-grads reassociates f32 adds, and adamw's
    # 1/sqrt(v) amplifies those last-ulp differences where the second
    # moment is still near zero — so compare with a small budget
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=0.1
        ),
        big,
        acc,
    )
    np.testing.assert_allclose(big_losses, acc_losses, atol=1e-4)


@pytest.mark.slow
def test_cosine_schedule_and_warmup_learn(model_path, tmp_path):
    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    _, _, _, losses = finetune(
        model_path, data, epochs=4, batch=4, lr=3e-3,
        schedule="cosine", warmup_steps=2, clip_norm=1.0, log=lambda m: None,
    )
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_resume_with_different_settings_rejected(model_path, tmp_path):
    """The resume guard pins everything that changes what a resumed run
    replays: batching, the shuffle seed, and the optimizer/schedule args
    (ADVICE r2: seed/lr/schedule changes used to slip through silently)."""
    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    ck = str(tmp_path / "ckpt")
    finetune(model_path, data, epochs=1, batch=4, ckpt_dir=ck, log=lambda m: None)
    for kw in (
        dict(batch=8),  # epoch accounting
        dict(batch=4, seed=7),  # shuffle order
        dict(batch=4, lr=5e-3),  # update rule
        dict(batch=4, schedule="cosine"),  # LR curve shape
    ):
        with pytest.raises(ValueError, match="would not replay"):
            finetune(
                model_path, data, epochs=2, ckpt_dir=ck,
                log=lambda m: None, **kw
            )
    # a meta file written BEFORE newer keys were recorded (older layout)
    # must still resume when the validatable keys match — missing keys
    # warn instead of hard-mismatching against None (review r3)
    import json

    with open(ck + ".meta.json") as f:
        meta = json.load(f)
    legacy = {k: meta[k] for k in ("batch", "n_images", "grad_accum")}
    with open(ck + ".meta.json", "w") as f:
        json.dump(legacy, f)
    msgs = []
    finetune(
        model_path, data, epochs=2, batch=4, ckpt_dir=ck, log=msgs.append
    )
    assert any("cannot be validated" in m for m in msgs)
    assert any("resumed from" in m for m in msgs)

    # a checkpoint whose sibling meta is gone cannot be validated at all
    os.remove(ck + ".meta.json")
    with pytest.raises(ValueError, match="cannot be validated"):
        finetune(
            model_path, data, epochs=2, batch=4, ckpt_dir=ck, log=lambda m: None
        )


def test_resume_cosine_epoch_extension_rejected(model_path, tmp_path):
    """Under a cosine schedule the decay length derives from total epochs,
    so extending epochs on resume rewrites the LR curve — reject; the
    const schedule allows it (test_resume_is_bit_identical)."""
    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    ck = str(tmp_path / "ckpt")
    kw = dict(batch=4, schedule="cosine", log=lambda m: None)
    finetune(model_path, data, epochs=2, ckpt_dir=ck, **kw)
    with pytest.raises(ValueError, match="would not replay"):
        finetune(model_path, data, epochs=4, ckpt_dir=ck, **kw)


@pytest.mark.slow
def test_finetune_at_higher_resolution(model_path, tmp_path):
    """--img-size: the classic low-res-pretrain / high-res-finetune ViT
    recipe. The 32px checkpoint trains at 48px (pos_embed resampled,
    models/resample.py); the exported gguf serves 48 natively; the resume
    guard pins the trained geometry."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.models.export import save_params

    data = _make_dataset(tmp_path / "train", size=48)
    ck = str(tmp_path / "ckpt")
    params, hp, classes, losses = finetune(
        model_path, data, epochs=3, batch=4, lr=1e-3, img_size=48,
        ckpt_dir=ck, log=lambda m: None,
    )
    assert hp.img_size == 48
    assert params["pos_embed"].shape == (6 * 6 + 1, 64)
    assert losses[-1] < losses[0]
    out = tmp_path / "ft48.gguf"
    save_params(str(out), params, hp, id2label=dict(enumerate(classes)))
    eng = VitEngine(str(out), verbose=False)
    assert eng.hp.img_size == 48
    rng = np.random.default_rng(0)
    dark = rng.integers(0, 40, (2, 48, 48, 3), dtype=np.uint8)
    import jax.numpy as jnp

    pix = jnp.stack([eng.preprocess_image(im) for im in dark])
    probs = np.asarray(eng.predict_probs_batch(pix))
    assert (probs.argmax(-1) == classes.index("aa_dark")).all()
    # resuming at a different resolution would restore mismatched shapes
    with pytest.raises(ValueError, match="would not replay"):
        finetune(
            model_path, data, epochs=4, batch=4, lr=1e-3, img_size=56,
            ckpt_dir=ck, log=lambda m: None,
        )
    # a LEGACY meta (predates img_size recording) must also reject a
    # geometry change — the warn-and-adopt path would crash inside orbax
    # restoring the native-grid pos_embed into a resampled template
    import json

    with open(ck + ".meta.json") as f:
        meta = json.load(f)
    meta.pop("img_size")
    with open(ck + ".meta.json", "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="predates --img-size"):
        finetune(
            model_path, data, epochs=4, batch=4, lr=1e-3, img_size=56,
            ckpt_dir=ck, log=lambda m: None,
        )


@pytest.mark.slow
def test_finetune_at_new_patch_size(model_path, tmp_path):
    """--patch-size: the FlexiViT transfer recipe. The p=8 checkpoint
    trains at p=4 (patch_embed PI-resized + pos_embed resampled,
    models/resample.py); the exported gguf serves p=4 natively; the
    resume guard pins the trained patch granularity."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.models.export import save_params

    data = _make_dataset(tmp_path / "train")
    ck = str(tmp_path / "ckpt")
    params, hp, classes, losses = finetune(
        model_path, data, epochs=3, batch=4, lr=1e-3, patch_size=4,
        ckpt_dir=ck, log=lambda m: None,
    )
    assert hp.patch_size == 4 and hp.img_size == 32
    assert params["pos_embed"].shape == (8 * 8 + 1, 64)
    assert params["patch_embed"]["kernel"].shape == (3 * 4 * 4, 64)
    assert losses[-1] < losses[0]
    out = tmp_path / "ft_p4.gguf"
    save_params(str(out), params, hp, id2label=dict(enumerate(classes)))
    eng = VitEngine(str(out), verbose=False)
    assert eng.hp.patch_size == 4
    rng = np.random.default_rng(0)
    dark = rng.integers(0, 40, (2, 32, 32, 3), dtype=np.uint8)
    import jax.numpy as jnp

    pix = jnp.stack([eng.preprocess_image(im) for im in dark])
    probs = np.asarray(eng.predict_probs_batch(pix))
    assert (probs.argmax(-1) == classes.index("aa_dark")).all()
    # resuming at a different patch granularity would restore mismatched
    # patch_embed/pos_embed shapes
    with pytest.raises(ValueError, match="does not match|would not replay"):
        finetune(
            model_path, data, epochs=4, batch=4, lr=1e-3, patch_size=16,
            ckpt_dir=ck, log=lambda m: None,
        )
    # a LEGACY meta (predates patch_size recording) must also reject
    import json

    with open(ck + ".meta.json") as f:
        meta = json.load(f)
    meta.pop("patch_size")
    with open(ck + ".meta.json", "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="predates --patch-size"):
        finetune(
            model_path, data, epochs=4, batch=4, lr=1e-3, patch_size=16,
            ckpt_dir=ck, log=lambda m: None,
        )


def test_stream_matches_preloaded_bit_identically(model_path, tmp_path):
    """--stream decodes per batch on a prefetch thread; batch composition
    derives from indices either way, so the trained parameters must be
    BIT-identical to the preloaded run (same seed, same data)."""
    import jax

    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    kw = dict(epochs=2, batch=4, lr=1e-3, seed=3, log=lambda m: None)
    p_pre, _, _, l_pre = finetune(model_path, data, **kw)
    p_str, _, _, l_str = finetune(model_path, data, stream=True, **kw)
    assert l_pre == l_str
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p_pre,
        p_str,
    )


def test_stream_surfaces_decode_errors(model_path, tmp_path):
    """A corrupt training file must fail the run with the offending path,
    not hang the prefetch pipeline."""
    from vit_cpp_tpu.finetune import finetune

    data = _make_dataset(tmp_path / "train")
    bad = tmp_path / "train" / "aa_dark" / "zz_corrupt.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot really a png")
    with pytest.raises(ValueError, match="undecodable"):
        finetune(
            model_path, data, epochs=1, batch=4, stream=True,
            log=lambda m: None,
        )


def test_prefetch_worker_stops_when_consumer_abandons():
    """Abandoning the prefetch generator mid-epoch (train step raised)
    must not leave the worker thread blocked in put() holding chunks."""
    import threading
    import time

    from vit_cpp_tpu.finetune import _prefetch_batches

    fetched = []

    def fetch(idx):
        fetched.append(idx)
        return np.zeros((2, 2), np.float32)

    gen = _prefetch_batches(fetch, list(range(50)), depth=2)
    next(gen)  # worker now prefetching ahead / blocked on the full queue
    gen.close()  # consumer abandons (GeneratorExit -> finally drains)
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if not any(
            t.name == "vit-finetune-prefetch" and t.is_alive()
            for t in threading.enumerate()
        ):
            break
        time.sleep(0.05)
    else:
        raise AssertionError("prefetch worker still alive after close()")
    assert len(fetched) < 50  # it stopped early, not after the full epoch


@pytest.mark.slow
def test_mesh_finetune_runs(model_path, tmp_path):
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.parallel.mesh import make_mesh

    data = _make_dataset(tmp_path / "train")
    mesh = make_mesh(dp=4, tp=2)
    params, hp, _, losses = finetune(
        model_path, data, epochs=2, batch=8, lr=1e-3, mesh=mesh,
        log=lambda m: None,
    )
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    assert np.isfinite(np.asarray(params["head"]["kernel"])).all()
    # EMA over sharded params: the copy/update tree ops preserve the mesh
    # layout and the returned EMA weights are finite and head-moved
    ema, _, _, _ = finetune(
        model_path, data, epochs=2, batch=8, lr=1e-3, mesh=mesh, ema=0.8,
        log=lambda m: None,
    )
    k = np.asarray(ema["head"]["kernel"])
    assert np.isfinite(k).all() and np.abs(k).sum() > 0


def test_cli_end_to_end(model_path, tmp_path, capsys):
    from vit_cpp_tpu.cli.finetune import main
    from vit_cpp_tpu.engine import VitEngine

    train = _make_dataset(tmp_path / "train")
    val = _make_dataset(tmp_path / "val", n_per_class=4, seed=9)
    out = str(tmp_path / "ft.gguf")
    rc = main(
        [
            "-m", model_path, "-d", train, "-o", out,
            "--val-dir", val, "--epochs", "3", "-b", "4", "--lr", "1e-3",
        ]
    )
    err = capsys.readouterr().err
    assert rc == 0
    assert "re-initializing head 7 -> 2" in err
    assert "val top-1" in err and "wrote" in err
    engine = VitEngine(out, verbose=False)
    assert engine.hp.num_classes == 2


def _make_vitstr_dataset(root, words=("aa", "bb"), n_per=6, seed=0):
    """Word images whose pixels correlate with the label: 'aa' dark,
    'bb' bright — learnable by a tiny model in a few epochs."""
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    ranges = {"aa": (0, 50), "bb": (200, 255)}
    for w in words:
        lo, hi = ranges[w]
        for i in range(n_per):
            img = rng.integers(lo, hi, (32, 100, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / f"{w}_{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def vitstr_model_path(tmp_path_factory):
    from vit_cpp_tpu.models.vitstr import vitstr_id2label

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=96,
        patch_size=16,
        img_size=96,
        in_chans=1,
        seq_len=25,
    )
    p = tmp_path_factory.mktemp("ftstr") / "s.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=6, id2label=vitstr_id2label())
    return str(p)


@pytest.mark.slow
def test_vitstr_finetune_learns_and_serves(vitstr_model_path, tmp_path):
    """Scene-text fine-tuning: filename-stem labels, loss decreases, the
    exported gguf recognizes through VitstrEngine, and the train set is
    word-accurate after a few epochs."""
    from vit_cpp_tpu.engine import VitstrEngine
    from vit_cpp_tpu.finetune import (
        _preprocess_all,
        evaluate_vitstr,
        finetune,
        load_vitstr_dataset,
    )
    from vit_cpp_tpu.models.export import save_params

    data = _make_vitstr_dataset(tmp_path / "words")
    params, hp, classes, losses = finetune(
        vitstr_model_path, data, epochs=8, batch=4, lr=5e-3,
        log=lambda m: None,
    )
    assert hp.seq_len == 25 and len(classes) == 96
    assert losses[-1] < 1.2 < losses[0]  # ~2.8 -> well under 1.2

    # content separation learned: the position-1 character is right for
    # every sample ('a' for aa-words, 'b' for bb-words). Full exact-match
    # convergence (EOS placement from pos_embed alone) needs more steps
    # than a unit test budget — evaluate_vitstr is exercised for the
    # metric path, not asserted to a bar.
    import jax.numpy as jnp

    from vit_cpp_tpu.finetune import _eval_fwd_probs

    paths, texts = load_vitstr_dataset(data)
    pixels = _preprocess_all(paths, hp, 1)
    probs = np.asarray(_eval_fwd_probs()(params, jnp.asarray(pixels), hp=hp))
    id2label = dict(enumerate(classes))
    for text, pr in zip(texts, probs):
        assert id2label[int(pr[1].argmax())] == text[0]
    acc = evaluate_vitstr(params, hp, pixels, texts, batch=4)
    assert 0.0 <= acc <= 1.0

    out = str(tmp_path / "ft.gguf")
    save_params(out, params, hp, id2label=id2label)
    engine = VitstrEngine(out, verbose=False)
    text, conf = engine.recognize_file(paths[0], verbose=False)
    assert text.startswith("a") and 0.0 <= conf <= 1.0


def test_vitstr_gt_txt_and_encode_errors(tmp_path):
    from vit_cpp_tpu.finetune import encode_texts, load_vitstr_dataset
    from vit_cpp_tpu.models.vitstr import EOS_ID

    d = tmp_path / "ds"
    _make_vitstr_dataset(d, n_per=1)
    (d / "gt.txt").write_text("aa_0.png\thello\nbb_0.png\tworld\n")
    paths, texts = load_vitstr_dataset(str(d))
    assert texts == ["hello", "world"]
    assert paths[0].endswith("aa_0.png")

    t = encode_texts(["ab"], 25)
    assert t.shape == (1, 25)
    assert t[0, 0] == -1 and t[0, 3] == EOS_ID and (t[0, 4:] == -1).all()
    with pytest.raises(ValueError, match="not in the vocab"):
        encode_texts(["é"], 25)
    with pytest.raises(ValueError, match="chars > seq_len"):
        encode_texts(["x" * 24], 25)
    (d / "gt.txt").write_text("missing-tab-line\n")
    with pytest.raises(ValueError, match="path<TAB>text"):
        load_vitstr_dataset(str(d))


def test_rejects_bad_dirs_and_batches(model_path, tmp_path):
    from vit_cpp_tpu.cli.finetune import main
    from vit_cpp_tpu.finetune import load_dataset

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no class subdirectories"):
        load_dataset(str(empty))
    # batch larger than the dataset -> clean CLI error
    data = _make_dataset(tmp_path / "tiny", n_per_class=1)
    rc = main(["-m", model_path, "-d", data, "-o", str(tmp_path / "x.gguf"),
               "-b", "64"])
    assert rc == 1
