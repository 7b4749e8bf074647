"""DINOv2-family support: register tokens + headless encoders.

Register tokens ("Vision Transformers Need Registers", Darcet et al.;
timm reg_token) ride after CLS and are excluded from every pooling
readout; headless checkpoints (no head.weight — MAE/DINO pretrained)
serve embeddings only and fine-tune by attaching a fresh head. Parity
authority: the f64 numpy oracle."""

import dataclasses

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.ref_numpy import forward_numpy
from vit_cpp_tpu.testing.synthetic import random_state_dict, write_synthetic_model

# DINOv2-with-registers layout: CLS + 4 registers, grid-only pos_embed
HP_REG = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=10,
    patch_size=8,
    img_size=32,
    num_reg_tokens=4,
    no_embed_class=True,
)
# registers with class-embedded pos rows (pos covers cls+reg+grid)
HP_REG_EMB = dataclasses.replace(HP_REG, no_embed_class=False)
# headless avg-pool encoder with registers (the DINOv2 backbone shape)
HP_HEADLESS = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=0,
    patch_size=8,
    img_size=32,
    num_prefix_tokens=0,
    global_pool="avg",
    num_reg_tokens=4,
    no_embed_class=True,
)


def _images(hp, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, hp.img_size, hp.img_size)).astype(
        np.float32
    )


def test_shapes_and_counts():
    from vit_cpp_tpu.testing.synthetic import state_dict_shapes

    s = state_dict_shapes(HP_REG)
    assert s["reg_token"] == (1, 4, 64)
    assert s["pos_embed"] == (1, HP_REG.n_patches, 64)  # grid only
    assert HP_REG.n_tokens == 16 + 1 + 4 and HP_REG.n_prefix == 5
    assert HP_REG.expected_tensor_count() == len(s)
    s2 = state_dict_shapes(HP_REG_EMB)
    assert s2["pos_embed"] == (1, 16 + 5, 64)
    s3 = state_dict_shapes(HP_HEADLESS)
    assert "head.weight" not in s3 and "cls_token" not in s3
    assert HP_HEADLESS.expected_tensor_count() == len(s3)


@pytest.mark.parametrize(
    "hp", [HP_REG, HP_REG_EMB], ids=["no_embed_class", "embedded"]
)
def test_forward_matches_numpy_oracle(hp):
    state = random_state_dict(hp, seed=11)
    params = params_from_state_dict(state, hp)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    got = np.asarray(forward(params, x, hp))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_headless_features_match_oracle():
    state = random_state_dict(HP_HEADLESS, seed=12)
    params = params_from_state_dict(state, HP_HEADLESS)
    assert "head" not in params
    x = _images(HP_HEADLESS)
    want = forward_numpy(state, HP_HEADLESS, x)  # pooled features
    got = np.asarray(forward(params, x, HP_HEADLESS, features=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    with pytest.raises(ValueError, match="headless encoder"):
        forward(params, x, HP_HEADLESS)


def test_registers_are_excluded_from_avg_pool():
    """Registers must not enter the pooled mean. With the residual
    branches zeroed (proj/fc2 weights = 0) every block is the identity,
    so tokens never mix — perturbing ONLY the register values must then
    leave the avg-pool features bit-identical."""
    state = random_state_dict(HP_HEADLESS, seed=13)
    for i in range(HP_HEADLESS.num_hidden_layers):
        for t in ("attn.proj.weight", "attn.proj.bias",
                  "mlp.fc2.weight", "mlp.fc2.bias"):
            state[f"blocks.{i}.{t}"] = np.zeros_like(state[f"blocks.{i}.{t}"])
    params = params_from_state_dict(state, HP_HEADLESS)
    x = _images(HP_HEADLESS)
    base = np.asarray(forward(params, x, HP_HEADLESS, features=True))
    s2 = dict(state)
    s2["reg_token"] = state["reg_token"] + 1.0
    got = np.asarray(
        forward(params_from_state_dict(s2, HP_HEADLESS), x, HP_HEADLESS,
                features=True)
    )
    np.testing.assert_array_equal(got, base)


@pytest.mark.parametrize(
    "hp", [HP_REG, HP_HEADLESS], ids=["reg_cls", "headless"]
)
def test_file_roundtrip_and_detection(tmp_path, hp):
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    p = tmp_path / "dino.gguf"
    state = write_synthetic_model(str(p), hp, ftype=1, seed=14)
    mf = read_model(str(p))
    assert len(mf.tensors) == hp.expected_tensor_count()
    got_hp = detect_hparams(mf)
    assert got_hp.num_reg_tokens == 4
    assert got_hp.num_classes == hp.num_classes
    assert got_hp.no_embed_class
    params = load_params(mf, hparams=got_hp)
    x = _images(hp)
    want = forward_numpy(state, hp, x)
    got = np.asarray(
        forward(params, x, got_hp, features=hp.num_classes == 0)
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_headless_engine_serves_embeddings(tmp_path):
    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "enc.gguf"
    write_synthetic_model(str(p), HP_HEADLESS, ftype=1, seed=15)
    eng = VitEngine(str(p), verbose=False)
    x = _images(HP_HEADLESS, n=4)
    feats = np.asarray(eng.features_batch(x))
    assert feats.shape == (4, 64) and np.isfinite(feats).all()
    with pytest.raises(ValueError, match="headless encoder"):
        eng.predict_probs_batch(x)
    # the production int8 + fold path serves features too
    w8 = VitEngine(str(p), mm_impl="int8", fold_ln=True, verbose=False)
    f8 = np.asarray(w8.features_batch(x))
    cos = (f8 * feats).sum() / (
        np.linalg.norm(f8) * np.linalg.norm(feats)
    )
    assert cos > 0.99
    # rollout works without a head (no top-k)
    from PIL import Image

    img = tmp_path / "x.png"
    rng = np.random.default_rng(16)
    Image.fromarray(
        rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(img)
    top, grid = eng.explain_file(str(img))
    assert top == [] and grid.shape == (4, 4)


def test_headless_daemon_serves_embed_only(tmp_path):
    import json
    import threading
    import urllib.error
    import urllib.request

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server

    p = tmp_path / "enc.gguf"
    write_synthetic_model(str(p), HP_HEADLESS, ftype=1, seed=17)
    engine = VitEngine(str(p), verbose=False)
    httpd, batcher = create_server(engine, port=0, batch=2, max_wait_ms=1.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["model"] == "vit-encoder"
        import io

        from PIL import Image

        buf = io.BytesIO()
        rng = np.random.default_rng(18)
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        req = urllib.request.Request(
            f"{base}/v1/embed", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            emb = json.loads(r.read())
        assert emb["shape"] == [64]
        req2 = urllib.request.Request(
            f"{base}/v1/classify", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req2, timeout=30)
        assert ei.value.code == 404  # no classify route on an encoder
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            text = r.read().decode()
        assert 'route="embed"' in text and 'route="classify"' not in text
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


@pytest.mark.slow
def test_finetune_attaches_head_to_headless_encoder(tmp_path):
    """The MAE/DINO workflow: pretrain headless -> fine-tune attaches a
    fresh classifier -> the output gguf serves classification."""
    from PIL import Image

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.models.export import save_params

    p = tmp_path / "enc.gguf"
    write_synthetic_model(str(p), HP_HEADLESS, ftype=1, seed=19)
    rng = np.random.default_rng(20)
    for cls, lo, hi in (("aa_dark", 0, 40), ("bb_bright", 210, 255)):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                rng.integers(lo, hi, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    params, hp, classes, losses = finetune(
        str(p), str(tmp_path / "train"), epochs=3, batch=4, lr=1e-3,
        log=lambda m: None,
    )
    assert hp.num_classes == 2 and "head" in params
    assert losses[-1] < losses[0]
    out = tmp_path / "ft.gguf"
    save_params(str(out), params, hp, id2label=dict(enumerate(classes)))
    eng = VitEngine(str(out), verbose=False)
    assert eng.hp.num_classes == 2 and eng.hp.num_reg_tokens == 4
    import jax.numpy as jnp

    dark = rng.integers(0, 40, (2, 32, 32, 3), dtype=np.uint8)
    pix = jnp.stack([eng.preprocess_image(im) for im in dark])
    probs = np.asarray(eng.predict_probs_batch(pix))
    assert (probs.argmax(-1) == classes.index("aa_dark")).all()


def test_sharded_and_resampled_reg_model(tmp_path):
    """Registers compose with the mesh (reg_token replicates) and with
    the img-size override (prefix rows carried through the resample)."""
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh

    hp = dataclasses.replace(HP_REG_EMB, num_classes=16)
    p = tmp_path / "reg.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=21)
    x = jnp.asarray(_images(hp, n=8, seed=2))
    ref = np.asarray(VitEngine(str(p), verbose=False).predict_probs_batch(x))
    mesh = make_mesh(dp=4, tp=2)
    sh = VitEngine(str(p), verbose=False).shard(mesh)
    with mesh:
        got = np.asarray(sh.predict_probs_batch(x))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    # resample 32 -> 48: pos prefix rows (cls + 4 reg) carry over
    r = VitEngine(str(p), img_size=48, verbose=False)
    assert r.params["pos_embed"].shape == (6 * 6 + 5, 64)
    x48 = jnp.asarray(
        np.random.default_rng(3)
        .standard_normal((2, 3, 48, 48))
        .astype(np.float32)
    )
    out = np.asarray(r.predict_probs_batch(x48))
    assert out.shape == (2, 16) and np.isfinite(out).all()


def test_corrupt_classifier_missing_head_fails_fast(tmp_path):
    """A header that declares classes while the head tensors are missing
    is corruption (headless files are written with num_classes=0) —
    detect/load must raise, not silently serve embeddings (review r3)."""
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.gguf.writer import write_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.testing.synthetic import state_dict_records

    hp = dataclasses.replace(HP_REG_EMB, num_classes=10)
    state = random_state_dict(hp, seed=28)
    state.pop("head.weight")
    state.pop("head.bias")
    p = tmp_path / "trunc.gguf"
    write_model(str(p), hp, {}, state_dict_records(state, 0), 0)
    mf = read_model(str(p))
    with pytest.raises(ValueError, match="head.weight is missing"):
        detect_hparams(mf)
    with pytest.raises(ValueError, match="head.weight is missing"):
        load_params(mf)


def test_classifier_artifact_has_no_embed_route(tmp_path):
    """A classifier .vitx has no features program: the daemon must not
    register /v1/embed for it (404, not a per-request 500) — review r3:
    AotEngine.features_batch is a guard method, so hasattr alone is not
    capability."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server

    hp = dataclasses.replace(HP_REG_EMB, num_classes=8)
    p = tmp_path / "cls.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=29)
    vitx = tmp_path / "cls.vitx"
    save_engine(VitEngine(str(p), verbose=False), str(vitx), batch=[2])
    aot = AotEngine(str(vitx))
    # generic probability surface refuses nothing here (classifier), but
    # a features artifact refuses IT (tested in test_aot_headless_artifact)
    httpd, batcher = create_server(aot, port=0, batch=2, max_wait_ms=1.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        req = urllib.request.Request(
            f"{base}/v1/embed", data=b"x", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_headless_artifact_probs_surface_rejected(tmp_path):
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "enc.gguf"
    write_synthetic_model(str(p), HP_HEADLESS, ftype=1, seed=30)
    vitx = tmp_path / "enc.vitx"
    save_engine(VitEngine(str(p), verbose=False), str(vitx), batch=[2])
    aot = AotEngine(str(vitx))
    with pytest.raises(ValueError, match="features program"):
        aot.predict_probs_batch(_images(HP_HEADLESS, n=2))


def test_ambiguous_pos_layout_needs_flag():
    """prefix 5 (CLS + 4 registers) on a 9-row pos_embed reads as BOTH a
    2x2 embedded grid and a bare 3x3 grid — the converter must demand
    --pos-layout instead of guessing (review r3)."""
    from vit_cpp_tpu.cli.convert import infer_hparams

    # 3x3 grid, patch 8 -> img 24; embedded reading would say img 16
    hp = dataclasses.replace(
        HP_REG, img_size=24, no_embed_class=True
    )
    state = random_state_dict(hp, seed=31)
    assert state["pos_embed"].shape[1] == 9
    with pytest.raises(ValueError, match="ambiguous"):
        infer_hparams(state, heads=4)
    got = infer_hparams(state, heads=4, pos_layout="grid")
    assert got.img_size == 24 and got.no_embed_class
    got2 = infer_hparams(state, heads=4, pos_layout="embedded")
    assert got2.img_size == 16 and not got2.no_embed_class


def test_convert_rejects_reg_plus_dist():
    from vit_cpp_tpu.cli.convert import infer_hparams

    hp = dataclasses.replace(
        HP_REG_EMB, num_prefix_tokens=2, num_reg_tokens=2
    )
    state = random_state_dict(hp, seed=32)
    with pytest.raises(ValueError, match="not a timm configuration"):
        infer_hparams(state, heads=4)


def test_invalid_combinations_rejected(tmp_path):
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.gguf.writer import write_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.testing.synthetic import state_dict_records

    # registers + dist_token
    hp = dataclasses.replace(
        HP_REG_EMB, num_prefix_tokens=2, num_reg_tokens=2
    )
    state = random_state_dict(hp, seed=22)
    p = tmp_path / "bad.gguf"
    write_model(str(p), hp, {}, state_dict_records(state, 0), 0)
    with pytest.raises(ValueError, match="not a timm configuration"):
        load_params(read_model(str(p)))


def test_quantize_headless_and_serve(tmp_path):
    """vit-quantize on a headless register checkpoint (reg_token stays
    f32 like cls_token; block weights quantize) -> W8A8 embedding serving
    agrees with the f16 original."""
    from vit_cpp_tpu.cli.quantize import main as quantize_main
    from vit_cpp_tpu.engine import VitEngine

    src = tmp_path / "enc.gguf"
    write_synthetic_model(str(src), HP_HEADLESS, ftype=1, seed=24)
    dst = tmp_path / "enc-q8.gguf"
    assert quantize_main([str(src), str(dst), "8"]) == 0
    x = _images(HP_HEADLESS, n=4)
    ref = np.asarray(
        VitEngine(str(src), verbose=False).features_batch(x)
    )
    q8 = VitEngine(
        str(dst), mm_impl="int8", fold_ln=True, verbose=False
    )
    got = np.asarray(q8.features_batch(x))
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.99


def test_aot_headless_artifact(tmp_path):
    """vit-export on a headless encoder bakes the FEATURES program; the
    artifact serves embeddings (engine + daemon) and refuses to classify."""
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server

    p = tmp_path / "enc.gguf"
    write_synthetic_model(str(p), HP_HEADLESS, ftype=1, seed=25)
    live = VitEngine(str(p), verbose=False)
    vitx = tmp_path / "enc.vitx"
    meta = save_engine(live, str(vitx), batch=[2])
    assert meta["program"] == "features"
    aot = AotEngine(str(vitx))
    assert aot.hp.num_classes == 0
    x = _images(HP_HEADLESS, n=2)
    np.testing.assert_allclose(
        np.asarray(aot.features_batch(x)),
        np.asarray(live.features_batch(x)),
        atol=1e-5,
        rtol=1e-5,
    )
    with pytest.raises(ValueError, match="headless encoder"):
        aot.classify_file(str(tmp_path / "nope.png"))
    # classifier artifacts refuse the features surface
    cls_gguf = tmp_path / "cls.gguf"
    write_synthetic_model(
        str(cls_gguf),
        dataclasses.replace(HP_REG_EMB, num_classes=8),
        ftype=1,
        seed=26,
    )
    cls_vitx = tmp_path / "cls.vitx"
    save_engine(VitEngine(str(cls_gguf), verbose=False), str(cls_vitx), batch=[2])
    with pytest.raises(ValueError, match="classifier program"):
        AotEngine(str(cls_vitx)).features_batch(x)
    # the daemon serves a headless artifact embed-only
    import json
    import threading
    import urllib.request

    httpd, batcher = create_server(aot, port=0, batch=2, max_wait_ms=1.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["model"] == "vit-encoder"
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(27).integers(
                0, 255, (40, 40, 3), dtype=np.uint8
            )
        ).save(buf, format="PNG")
        req = urllib.request.Request(
            f"{base}/v1/embed", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["shape"] == [64]
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_convert_cli_dinov2(tmp_path):
    import torch

    from vit_cpp_tpu.cli.convert import convert, infer_hparams
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params

    for hp in (HP_REG, HP_REG_EMB, HP_HEADLESS):
        state = random_state_dict(hp, seed=23)
        inferred = infer_hparams(state, heads=hp.num_attention_heads)
        assert inferred.num_reg_tokens == 4
        assert inferred.num_classes == hp.num_classes
        assert inferred.no_embed_class == hp.no_embed_class
        ckpt = tmp_path / "d.pth"
        torch.save({k: torch.from_numpy(v) for k, v in state.items()}, ckpt)
        out = convert(
            checkpoint=str(ckpt),
            output_dir=str(tmp_path),
            ftype=1,
            heads=hp.num_attention_heads,
            verbose=False,
        )
        mf = read_model(out)
        got_hp = detect_hparams(mf)
        params = load_params(mf, hparams=got_hp)
        x = _images(hp)
        want = forward_numpy(state, hp, x)
        got = np.asarray(
            forward(params, x, got_hp, features=hp.num_classes == 0)
        )
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
